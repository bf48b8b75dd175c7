"""Noise schedules for VP diffusion: the logSNR <-> time bijection.

TPU-native rebuild of the reference `NoiseScheduleVP`
(ref: dpm_solver_pytorch.py:6-167, dpm_solver_jax.py:7-175).

Design notes (how this differs from the reference):
  * The schedule is a frozen dataclass registered as a JAX pytree, so it can be
    closed over / passed through `jit`, `vmap`, `lax.scan`, and `pjit` freely.
  * The discrete schedule's piecewise-linear interpolation is implemented with a
    vectorized `searchsorted` (O(log N) per query) instead of the reference's
    O(N log N) concat+sort trick (ref: dpm_solver_pytorch.py:1253-1292), with
    identical linear-extrapolation edge semantics.
  * Every method has a dual host-side float64 path (`*_np`) used by the plan
    builder (tables of solver coefficients are precomputed on the host at high
    precision; the device never interpolates inside the sampling loop).
  * `cosine` is supported (the reference has it only in the JAX/stable-diffusion
    copies: dpm_solver_jax.py:114-124,134-137,171-175).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
ArrayLike = Union[jax.Array, np.ndarray, float]


def interp_linear_extrap(x, xp, yp):
    """Piecewise-linear interpolation with *linear extrapolation* at both ends.

    Matches the edge semantics of the reference `interpolate_fn`
    (dpm_solver_pytorch.py:1253-1292): queries beyond the keypoint range are
    extrapolated using the outermost segment. `xp` must be strictly increasing.

    Works for both numpy (host, float64) and jax.numpy inputs.
    """
    lib = jnp if isinstance(x, jax.Array) or isinstance(xp, jax.Array) else np
    x = lib.asarray(x)
    xp = lib.asarray(xp)
    yp = lib.asarray(yp)
    k = xp.shape[0]
    # Segment index i such that we interpolate between keypoints (i-1, i).
    idx = lib.clip(lib.searchsorted(xp, x, side="left"), 1, k - 1)
    x0 = xp[idx - 1]
    x1 = xp[idx]
    y0 = yp[idx - 1]
    y1 = yp[idx]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def _numerical_clip_alpha(log_alphas: np.ndarray, clipped_lambda: float = -5.1) -> np.ndarray:
    """Drop trailing table entries whose half-logSNR falls below `clipped_lambda`.

    Cosine-like discrete schedules have lambda -> -inf near t=T, which destroys
    the invertibility of lambda(t); the reference clips them
    (ref: dpm_solver_pytorch.py:114-125).
    """
    log_sigmas = 0.5 * np.log1p(-np.exp(2.0 * log_alphas))
    lambs = log_alphas - log_sigmas
    # lambs is decreasing in t; count trailing entries strictly below the clip.
    n_clip = int(np.searchsorted(lambs[::-1], clipped_lambda))
    if n_clip > 0:
        log_alphas = log_alphas[:-n_clip]
    return log_alphas


class _RefCompatMeta(type):
    """Route reference-style construction to :meth:`NoiseScheduleVP.create`.

    The reference API is ``NoiseScheduleVP('discrete', betas=...)``
    (dpm_solver_pytorch.py:34-96); our dataclass constructor takes the full
    field set. Any call that does not provide ``total_N`` (always present in
    direct dataclass construction and pytree unflattening) is treated as a
    reference-style call.
    """

    def __call__(cls, *args, **kwargs):
        if len(args) < 2 and "total_N" not in kwargs:
            return cls.create(*args, **kwargs)
        return super().__call__(*args, **kwargs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseScheduleVP(metaclass=_RefCompatMeta):
    """VP forward-process schedule: alpha_t, sigma_t, lambda_t and lambda^{-1}.

    q(x_t | x_0) = N(alpha_t x_0, sigma_t^2 I),  lambda_t = log alpha_t - log sigma_t.

    Construct via :func:`NoiseScheduleVP.create` (named constructors `discrete`,
    `linear`, `cosine` also exist). Instances are immutable pytrees; the static
    metadata (`schedule`, `total_N`, `T`, scalar hyperparameters) is hashable so
    the object can be a `jit` static argument or simply closed over.
    """

    # --- static metadata ---
    schedule: str = dataclasses.field(metadata=dict(static=True))
    total_N: int = dataclasses.field(metadata=dict(static=True))
    T: float = dataclasses.field(metadata=dict(static=True))
    beta_0: float = dataclasses.field(metadata=dict(static=True), default=0.1)
    beta_1: float = dataclasses.field(metadata=dict(static=True), default=20.0)
    cosine_s: float = dataclasses.field(metadata=dict(static=True), default=0.008)
    cosine_beta_max: float = dataclasses.field(metadata=dict(static=True), default=999.0)
    # --- traced leaves (discrete schedule tables; shape [K], increasing t) ---
    t_array: Optional[Array] = None
    log_alpha_array: Optional[Array] = None

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @staticmethod
    def create(
        schedule: str = "discrete",
        betas: Optional[ArrayLike] = None,
        alphas_cumprod: Optional[ArrayLike] = None,
        continuous_beta_0: float = 0.1,
        continuous_beta_1: float = 20.0,
        dtype=jnp.float32,
    ) -> "NoiseScheduleVP":
        if schedule not in ("discrete", "linear", "cosine"):
            raise ValueError(
                f"Unsupported noise schedule {schedule!r}; need 'discrete', 'linear' or 'cosine'."
            )
        if schedule == "discrete":
            if betas is not None:
                betas = np.asarray(betas, dtype=np.float64)
                log_alphas = 0.5 * np.cumsum(np.log1p(-betas))
            else:
                if alphas_cumprod is None:
                    raise ValueError("discrete schedule needs `betas` or `alphas_cumprod`")
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod, dtype=np.float64))
            log_alphas = _numerical_clip_alpha(log_alphas)
            total_n = log_alphas.shape[0]
            # t_i = (i + 1) / N on the *original* table length semantics:
            # reference keeps N = len(clipped table) and t = linspace(0,1,N+1)[1:]
            # (dpm_solver_pytorch.py:105-107).
            t_array = np.linspace(0.0, 1.0, total_n + 1, dtype=np.float64)[1:]
            return NoiseScheduleVP(
                schedule="discrete",
                total_N=total_n,
                T=1.0,
                t_array=jnp.asarray(t_array, dtype=dtype),
                log_alpha_array=jnp.asarray(log_alphas, dtype=dtype),
            )
        elif schedule == "linear":
            return NoiseScheduleVP(
                schedule="linear",
                total_N=1000,
                T=1.0,
                beta_0=float(continuous_beta_0),
                beta_1=float(continuous_beta_1),
            )
        else:  # cosine
            s = 0.008
            beta_max = 999.0
            # the reference hard-sets T=0.9946 for cosine (T=1 is numerically
            # singular) and keeps total_N=1000 for all continuous schedules
            # (dpm_solver_jax.py:110-124)
            return NoiseScheduleVP(
                schedule="cosine",
                total_N=1000,
                T=0.9946,
                cosine_s=s,
                cosine_beta_max=beta_max,
            )

    # Convenience named constructors --------------------------------------------------

    @staticmethod
    def discrete(betas=None, alphas_cumprod=None, dtype=jnp.float32) -> "NoiseScheduleVP":
        return NoiseScheduleVP.create("discrete", betas=betas, alphas_cumprod=alphas_cumprod, dtype=dtype)

    @staticmethod
    def linear(beta_0: float = 0.1, beta_1: float = 20.0) -> "NoiseScheduleVP":
        return NoiseScheduleVP.create("linear", continuous_beta_0=beta_0, continuous_beta_1=beta_1)

    @staticmethod
    def cosine() -> "NoiseScheduleVP":
        return NoiseScheduleVP.create("cosine")

    # ------------------------------------------------------------------ #
    # device-side (jnp) methods — jit/vmap/scan safe
    # ------------------------------------------------------------------ #

    def _log_alpha_cosine(self, t, lib):
        s = self.cosine_s
        log_fn = lambda u: lib.log(lib.cos((u + s) / (1.0 + s) * math.pi / 2.0))
        return log_fn(t) - math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))

    def marginal_log_mean_coeff(self, t):
        """log(alpha_t) for continuous t in (0, T]."""
        t = jnp.asarray(t)
        if self.schedule == "discrete":
            return interp_linear_extrap(t, self.t_array, self.log_alpha_array)
        elif self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        else:
            return self._log_alpha_cosine(t, jnp)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(-jnp.expm1(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_alpha = self.marginal_log_mean_coeff(t)
        log_sigma = 0.5 * jnp.log(-jnp.expm1(2.0 * log_alpha))
        return log_alpha - log_sigma

    def inverse_lambda(self, lamb):
        """t such that lambda_t == lamb (lambda is strictly decreasing in t)."""
        lamb = jnp.asarray(lamb)
        if self.schedule == "linear":
            tmp = (
                2.0
                * (self.beta_1 - self.beta_0)
                * jnp.logaddexp(-2.0 * lamb, jnp.zeros_like(lamb))
            )
            delta = self.beta_0**2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        elif self.schedule == "discrete":
            log_alpha = -0.5 * jnp.logaddexp(jnp.zeros_like(lamb), -2.0 * lamb)
            # log_alpha_array is decreasing in t -> reverse both tables.
            return interp_linear_extrap(
                log_alpha, self.log_alpha_array[::-1], self.t_array[::-1]
            )
        else:  # cosine
            s = self.cosine_s
            log_alpha = -0.5 * jnp.logaddexp(-2.0 * lamb, jnp.zeros_like(lamb))
            t_fn = (
                lambda la: jnp.arccos(
                    jnp.exp(la + math.log(math.cos(s / (1.0 + s) * math.pi / 2.0)))
                )
                * 2.0
                * (1.0 + s)
                / math.pi
                - s
            )
            return t_fn(log_alpha)

    # ------------------------------------------------------------------ #
    # host-side float64 twins — used by the plan builder (solver/plan.py)
    # ------------------------------------------------------------------ #

    @property
    def _np_tables(self):
        t = np.asarray(self.t_array, dtype=np.float64)
        la = np.asarray(self.log_alpha_array, dtype=np.float64)
        return t, la

    def marginal_log_mean_coeff_np(self, t) -> np.ndarray:
        t = np.asarray(t, dtype=np.float64)
        if self.schedule == "discrete":
            ta, la = self._np_tables
            return interp_linear_extrap(t, ta, la)
        elif self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        else:
            return self._log_alpha_cosine(t, np)

    def marginal_alpha_np(self, t) -> np.ndarray:
        return np.exp(self.marginal_log_mean_coeff_np(t))

    def marginal_std_np(self, t) -> np.ndarray:
        return np.sqrt(-np.expm1(2.0 * self.marginal_log_mean_coeff_np(t)))

    def marginal_lambda_np(self, t) -> np.ndarray:
        log_alpha = self.marginal_log_mean_coeff_np(t)
        log_sigma = 0.5 * np.log(-np.expm1(2.0 * log_alpha))
        return log_alpha - log_sigma

    def inverse_lambda_np(self, lamb) -> np.ndarray:
        lamb = np.asarray(lamb, dtype=np.float64)
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(-2.0 * lamb, 0.0)
            delta = self.beta_0**2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        elif self.schedule == "discrete":
            ta, la = self._np_tables
            log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lamb)
            return interp_linear_extrap(log_alpha, la[::-1], ta[::-1])
        else:
            s = self.cosine_s
            log_alpha = -0.5 * np.logaddexp(-2.0 * lamb, 0.0)
            return (
                np.arccos(np.exp(log_alpha + math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))))
                * 2.0
                * (1.0 + s)
                / math.pi
                - s
            )


def interpolate_fn(x, xp, yp):
    """Drop-in shim for the reference's batched keypoint interpolation
    (dpm_solver_pytorch.py:1253-1292 / dpm_solver_jax.py:1125-1158):
    x [N, C], xp/yp [C, K] -> [N, C], linear extrapolation at both ends.
    Internally the vectorized-searchsorted form, vmapped over channels."""
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    yp = jnp.asarray(yp)
    per_channel = jax.vmap(interp_linear_extrap, in_axes=(1, 0, 0), out_axes=1)
    return per_channel(x, xp, yp)


def expand_dims(v, dims: int):
    """Reference helper (dpm_solver_pytorch.py:1295-1305): append trailing
    singleton axes until `v` has `dims` dimensions total."""
    v = jnp.asarray(v)
    return v[(...,) + (None,) * (dims - v.ndim)]
