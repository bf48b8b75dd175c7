"""Model abstraction layer: normalize any diffusion net into eps_hat(x, t).

TPU-native rebuild of the reference `model_wrapper`
(ref: dpm_solver_pytorch.py:170-334, dpm_solver_jax.py:178-347).

Four parameterizations ("noise" | "x_start" | "v" | "score") and three
guidance modes ("uncond" | "classifier" | "classifier-free") are normalized to
a single continuous-time noise-prediction function

    model_fn(x, t_continuous) -> eps_hat        # t_continuous: scalar or (B,)

Design notes:
  * Classifier guidance uses `jax.grad` of the summed log-probability —
    the gradient is traced into the same XLA program as the UNet forward, so
    an entire guided NFE is one fused device computation (the reference does a
    separate autograd graph per step under torch.no_grad/enable_grad,
    dpm_solver_pytorch.py:300-307).
  * Classifier-free guidance evaluates cond/uncond as one 2x-batched call
    (bigger matmuls -> better MXU utilization); the concat/split is free under
    XLA. `cfg_fori=False` keeps that default.
  * Everything is a closure over pure functions; the returned model_fn is
    jit/vmap/pjit-compatible.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.utils.trees import bcast_right

MODEL_TYPES = ("noise", "x_start", "v", "score")
GUIDANCE_TYPES = ("uncond", "classifier", "classifier-free")


def _broadcast_t(t, batch: int):
    t = jnp.asarray(t)
    if t.ndim == 0:
        return jnp.full((batch,), t, dtype=t.dtype)
    return t


def model_wrapper(
    model: Callable,
    noise_schedule: NoiseScheduleVP,
    model_type: str = "noise",
    model_kwargs: Optional[dict] = None,
    guidance_type: str = "uncond",
    condition: Any = None,
    unconditional_condition: Any = None,
    guidance_scale: float = 1.0,
    classifier_fn: Optional[Callable] = None,
    classifier_kwargs: Optional[dict] = None,
) -> Callable:
    """Wrap `model` into a continuous-time noise prediction function.

    Args mirror the reference API (dpm_solver_pytorch.py:170-181). `model` has
    signature `model(x, t_input, **model_kwargs)` (uncond / classifier) or
    `model(x, t_input, cond, **model_kwargs)` (classifier-free).
    `classifier_fn(x, t_input, cond, **classifier_kwargs)` returns per-example
    log-probabilities (summed over the batch before differentiation).

    Returns `model_fn(x, t_continuous) -> eps_hat` with x of shape (B, ...)
    and t_continuous a scalar or (B,) array.
    """
    if model_type not in MODEL_TYPES:
        raise ValueError(f"model_type must be one of {MODEL_TYPES}, got {model_type!r}")
    if guidance_type not in GUIDANCE_TYPES:
        raise ValueError(f"guidance_type must be one of {GUIDANCE_TYPES}, got {guidance_type!r}")
    model_kwargs = model_kwargs or {}
    classifier_kwargs = classifier_kwargs or {}
    ns = noise_schedule

    def get_model_input_time(t_continuous):
        """Map continuous t in [1/N, 1] to the net's native label.

        Discrete nets trained on n = 0..N-1 get (t - 1/N) * 1000
        (ref: dpm_solver_pytorch.py:271-280); continuous nets get t unchanged.
        """
        if ns.schedule == "discrete":
            return (t_continuous - 1.0 / ns.total_N) * 1000.0
        return t_continuous

    def noise_pred_fn(x, t_continuous, cond=None):
        t_input = get_model_input_time(t_continuous)
        if cond is None:
            output = model(x, t_input, **model_kwargs)
        else:
            output = model(x, t_input, cond, **model_kwargs)
        if model_type == "noise":
            return output
        elif model_type == "x_start":
            alpha_t = ns.marginal_alpha(t_continuous)
            sigma_t = ns.marginal_std(t_continuous)
            return (x - bcast_right(alpha_t, x.ndim) * output) / bcast_right(sigma_t, x.ndim)
        elif model_type == "v":
            alpha_t = ns.marginal_alpha(t_continuous)
            sigma_t = ns.marginal_std(t_continuous)
            return bcast_right(alpha_t, x.ndim) * output + bcast_right(sigma_t, x.ndim) * x
        else:  # score
            sigma_t = ns.marginal_std(t_continuous)
            return -bcast_right(sigma_t, x.ndim) * output

    def cond_grad_fn(x, t_input):
        """grad_x log p(cond | x_t), fused into the program via jax.grad."""

        def log_prob_sum(xi):
            log_prob = classifier_fn(xi, t_input, condition, **classifier_kwargs)
            return jnp.sum(log_prob)

        return jax.grad(log_prob_sum)(x)

    def model_fn(x, t_continuous):
        t_continuous = _broadcast_t(t_continuous, x.shape[0])
        if guidance_type == "uncond":
            return noise_pred_fn(x, t_continuous)
        elif guidance_type == "classifier":
            if classifier_fn is None:
                raise ValueError("classifier guidance requires classifier_fn")
            t_input = get_model_input_time(t_continuous)
            cond_grad = cond_grad_fn(x, t_input)
            sigma_t = ns.marginal_std(t_continuous)
            noise = noise_pred_fn(x, t_continuous)
            return noise - guidance_scale * bcast_right(sigma_t, x.ndim) * cond_grad
        else:  # classifier-free
            if guidance_scale == 1.0 or unconditional_condition is None:
                return noise_pred_fn(x, t_continuous, cond=condition)
            # Fold cond/uncond into one doubled batch: a single large model
            # call keeps the MXU busy (ref semantics: dpm_solver_pytorch.py:322-330).
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t_continuous, t_continuous], axis=0)
            c_in = jax.tree.map(
                lambda u, c: jnp.concatenate([jnp.asarray(u), jnp.asarray(c)], axis=0),
                unconditional_condition,
                condition,
            )
            out = noise_pred_fn(x_in, t_in, cond=c_in)
            noise_uncond, noise = jnp.split(out, 2, axis=0)
            return noise_uncond + guidance_scale * (noise - noise_uncond)

    return model_fn
