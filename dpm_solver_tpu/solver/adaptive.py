"""Adaptive step-size DPM-Solver (DPM-Solver-12 / -23) under lax.while_loop.

The step size depends on the running error estimate, so unlike the fixed-grid
planners the schedule math (lambda, lambda^{-1}, alpha, sigma) runs on device
here — the generic coefficient code in solver/updates.py is reused with
lib=jax.numpy. The whole controller is one compiled XLA program; NFE comes
back as a scalar instead of a host print.

(ref: dpm_solver_pytorch.py:956-1010; JAX loop precedent dpm_solver_jax.py:899-964)
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver import updates as U
from dpm_solver_tpu.utils.trees import bcast_right


def _exec_segment_rows(ns, eval_fn, x, hist, rows, *, skip_first: int = 0):
    """Apply singlestep micro-rows on device; returns (x_final, hist)."""
    x_out = x
    for idx, (t_next, a, b, eval_after) in enumerate(rows):
        if idx < skip_first:
            continue
        y = a * x + b[0] * hist[0] + b[1] * hist[1] + b[2] * hist[2]
        if eval_after:
            m = eval_fn(y, t_next)
            hist = [m] + hist[:-1]
        else:
            x_out = y
    return x_out, hist


def adaptive_sample(
    model_fn: Callable,
    ns: NoiseScheduleVP,
    x: jax.Array,
    *,
    order: int = 3,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    algorithm_type: str = "dpmsolver++",
    correcting_x0_fn: Optional[Callable] = None,
    h_init: float = 0.05,
    atol: float = 0.0078,
    rtol: float = 0.05,
    theta: float = 0.9,
    t_err: float = 1e-5,
    solver_type: str = "dpmsolver",
    jit: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (x_0, nfe). Semantics match the reference controller
    (embedded 1-2 or 2-3 pair, Gotta-Go-Fast defaults, L2-over-delta error,
    all-or-nothing accept)."""
    if algorithm_type not in U.ODE_ALGORITHMS:
        raise ValueError("adaptive solver supports dpmsolver/dpmsolver++ only")
    if order not in (2, 3):
        raise ValueError(f"adaptive order must be 2 or 3, got {order}")
    t_0 = (1.0 / ns.total_N if ns.schedule == "discrete" else 1e-3) if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    predict_x0 = U.is_predict_x0(algorithm_type)

    def eval_fn(xi, t):
        eps = model_fn(xi, t)
        if not predict_x0:
            return eps
        alpha_t = bcast_right(ns.marginal_alpha(t), xi.ndim)
        sigma_t = bcast_right(ns.marginal_std(t), xi.ndim)
        x0 = (xi - sigma_t * eps) / alpha_t
        if correcting_x0_fn is not None:
            x0 = correcting_x0_fn(x0, t)
        return x0

    if order == 2:
        r_lo, r_hi = (None, None), (0.5, None)
        lo_order, hi_order = 1, 2
        hi_skip = 0          # higher reuses only m_s
    else:
        r_lo, r_hi = (1.0 / 3.0, None), (1.0 / 3.0, 2.0 / 3.0)
        lo_order, hi_order = 2, 3
        hi_skip = 1          # higher reuses m_s AND m_s1 (same r1 -> same s1)

    lambda_0 = ns.marginal_lambda(jnp.asarray(t_0, x.dtype))

    def run(x):
        s0 = jnp.asarray(t_T, x.dtype)
        lam_s0 = ns.marginal_lambda(s0)
        h0 = jnp.asarray(h_init, x.dtype)
        state = (x, x, s0, lam_s0, h0, jnp.asarray(0, jnp.int32))

        def cond(state):
            _, _, s, _, _, _ = state
            return jnp.abs(s - t_0) > t_err

        def body(state):
            x, x_prev, s, lam_s, h, nfe = state
            t = ns.inverse_lambda(lam_s + h)
            m_s = eval_fn(x, s)
            hist = [m_s, jnp.zeros_like(m_s), jnp.zeros_like(m_s)]
            lo_rows = U.singlestep_segment_rows(
                ns, s, t, lo_order, r1=r_lo[0], r2=r_lo[1],
                algorithm_type=algorithm_type, solver_type=solver_type, lib=jnp)
            x_lower, hist = _exec_segment_rows(ns, eval_fn, x, hist, lo_rows)
            hi_rows = U.singlestep_segment_rows(
                ns, s, t, hi_order, r1=r_hi[0], r2=r_hi[1],
                algorithm_type=algorithm_type, solver_type=solver_type, lib=jnp)
            x_higher, _ = _exec_segment_rows(ns, eval_fn, x, hist, hi_rows,
                                             skip_first=hi_skip)
            delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev)))
            diff = (x_higher - x_lower) / delta
            norms = jnp.sqrt(jnp.mean(jnp.square(diff.reshape(diff.shape[0], -1)), axis=-1))
            E = jnp.max(norms)  # global max: under pjit XLA inserts the all-reduce
            accept = E <= 1.0
            x_new = jnp.where(accept, x_higher, x)
            x_prev_new = jnp.where(accept, x_lower, x_prev)
            s_new = jnp.where(accept, t, s)
            lam_new = jnp.where(accept, ns.marginal_lambda(t), lam_s)
            h_new = jnp.minimum(theta * h * E ** (-1.0 / order), lambda_0 - lam_new)
            return (x_new, x_prev_new, s_new, lam_new, h_new, nfe + order)

        x, _, _, _, _, nfe = jax.lax.while_loop(cond, body, state)
        return x, nfe

    if jit:
        # keep closed-over model weights out of the HLO (see
        # sample._jit_hoisting_constants)
        from dpm_solver_tpu.solver.sample import _jit_hoisting_constants

        run = _jit_hoisting_constants(run, x, None)
    return run(x)
