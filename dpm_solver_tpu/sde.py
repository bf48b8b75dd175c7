"""SDE library: VP / sub-VP / VE forward SDEs and their reverse processes.

TPU-native rebuild of the score_sde SDE abstractions
(score_sde_jax/sde_lib.py:9-256). Differences from the reference:
  * SDEs are frozen dataclass pytrees (jit/vmap/pjit-safe, hashable statics),
    not abc classes; the reverse process is a function factory returning pure
    (drift, diffusion) / discretize closures instead of a dynamically
    subclassed object (sde_lib.py:72-110 builds a class inside a method —
    hostile to tracing).
  * Discrete tables are precomputed numpy on the host and stored as device
    constants.

`to_noise_schedule` bridges VP-family SDEs to the solver layer's
NoiseScheduleVP so DPM-Solver runs directly on score_sde checkpoints
(the reference does the same wiring at score_sde_jax/sampling.py:562).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.utils.trees import bcast_right


def batch_mul(a, b):
    """Multiply per-batch scalars against batched tensors."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return bcast_right(a, max(a.ndim, b.ndim)) * b


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VPSDE:
    """dx = -1/2 beta(t) x dt + sqrt(beta(t)) dw (DDPM continuous limit)."""

    beta_0: float = dataclasses.field(metadata=dict(static=True), default=0.1)
    beta_1: float = dataclasses.field(metadata=dict(static=True), default=20.0)
    N: int = dataclasses.field(metadata=dict(static=True), default=1000)

    @property
    def T(self):
        return 1.0

    def _betas(self):
        return np.linspace(self.beta_0 / self.N, self.beta_1 / self.N, self.N)

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        return batch_mul(-0.5 * beta_t, x), jnp.sqrt(beta_t)

    def marginal_prob(self, x, t):
        log_mean = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        return batch_mul(jnp.exp(log_mean), x), jnp.sqrt(-jnp.expm1(2.0 * log_mean))

    def prior_sampling(self, rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype)

    def prior_logp(self, z):
        n = math.prod(z.shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
            jnp.square(z.reshape(z.shape[0], -1)), -1) / 2.0

    def discretize(self, x, t):
        """DDPM ancestral discretization: f, G at the grid point nearest t."""
        betas = jnp.asarray(self._betas(), x.dtype)
        idx = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = betas[idx]
        alpha = 1.0 - beta
        return batch_mul(jnp.sqrt(alpha), x) - x, jnp.sqrt(beta)

    def to_noise_schedule(self) -> NoiseScheduleVP:
        return NoiseScheduleVP.linear(self.beta_0, self.beta_1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubVPSDE:
    """Sub-VP SDE (better likelihoods; score_sde eq. 29)."""

    beta_0: float = dataclasses.field(metadata=dict(static=True), default=0.1)
    beta_1: float = dataclasses.field(metadata=dict(static=True), default=20.0)
    N: int = dataclasses.field(metadata=dict(static=True), default=1000)

    @property
    def T(self):
        return 1.0

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        discount = -jnp.expm1(-2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
        return batch_mul(-0.5 * beta_t, x), jnp.sqrt(beta_t * discount)

    def marginal_prob(self, x, t):
        log_mean = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        return batch_mul(jnp.exp(log_mean), x), -jnp.expm1(2.0 * log_mean)

    def prior_sampling(self, rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype)

    def prior_logp(self, z):
        n = math.prod(z.shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
            jnp.square(z.reshape(z.shape[0], -1)), -1) / 2.0

    def discretize(self, x, t):
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * jnp.sqrt(dt)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VESDE:
    """Variance-exploding SDE (SMLD/NCSN)."""

    sigma_min: float = dataclasses.field(metadata=dict(static=True), default=0.01)
    sigma_max: float = dataclasses.field(metadata=dict(static=True), default=50.0)
    N: int = dataclasses.field(metadata=dict(static=True), default=1000)

    @property
    def T(self):
        return 1.0

    def _sigmas(self):
        return np.exp(np.linspace(math.log(self.sigma_min), math.log(self.sigma_max), self.N))

    def sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sde(self, x, t):
        sigma = self.sigma(t)
        diffusion = sigma * jnp.sqrt(
            2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return jnp.zeros_like(x), diffusion

    def marginal_prob(self, x, t):
        return x, self.sigma(t)

    def prior_sampling(self, rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype) * self.sigma_max

    def prior_logp(self, z):
        n = math.prod(z.shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi * self.sigma_max**2) - jnp.sum(
            jnp.square(z.reshape(z.shape[0], -1)), -1) / (2 * self.sigma_max**2)

    def discretize(self, x, t):
        """SMLD ancestral discretization."""
        sigmas = jnp.asarray(self._sigmas(), x.dtype)
        idx = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigma = sigmas[idx]
        adjacent = jnp.where(idx == 0, jnp.zeros_like(sigma), sigmas[jnp.maximum(idx - 1, 0)])
        return jnp.zeros_like(x), jnp.sqrt(sigma**2 - adjacent**2)


class ReverseSDE(NamedTuple):
    """Pure-function reverse-time SDE/ODE."""

    T: float
    N: int
    sde: Callable          # (x, t) -> (drift, diffusion)
    discretize: Callable   # (x, t) -> (f, G)
    probability_flow: bool


def reverse_sde(fwd, score_fn: Callable, probability_flow: bool = False) -> ReverseSDE:
    """Reverse process of `fwd` under `score_fn` (ref sde_lib.py:72-110)."""
    scale = 0.5 if probability_flow else 1.0

    def rev(x, t):
        drift, diffusion = fwd.sde(x, t)
        drift = drift - batch_mul(diffusion**2, score_fn(x, t) * scale)
        diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift, diffusion

    def rev_discretize(x, t):
        f, g = fwd.discretize(x, t)
        rev_f = f - batch_mul(g**2, score_fn(x, t) * scale)
        rev_g = jnp.zeros_like(g) if probability_flow else g
        return rev_f, rev_g

    return ReverseSDE(T=fwd.T, N=fwd.N, sde=rev, discretize=rev_discretize,
                      probability_flow=probability_flow)
