"""Adaptive Dormand–Prince RK45 as a single on-device XLA program.

The reference integrates its probability-flow ODEs with scipy's host-side
`solve_ivp` (examples/score_sde_jax/likelihood.py:108-110 and the black-box
ODE sampler, sampling.py:459-536): every step round-trips device->host->device
and the trajectory cannot live inside jit/pjit. This rebuild runs the same
RK45(4)5 pair under `lax.while_loop` with scipy-style error control
(scaled RMS norm, 0.9 safety factor, step clamps), so likelihood and ODE
sampling stay on-chip and compose with vmap/pjit.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand–Prince Butcher tableau (RK45, FSAL)
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = _A[6, :7].copy()  # 5th-order solution weights
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                -92097 / 339200, 187 / 2100, 1 / 40])
_E = _B5 - _B4  # embedded error weights


def _flat(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sizes = [l.size for l in leaves]
    shapes = [l.shape for l in leaves]
    vec = jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in leaves])
    def unflatten(v):
        out, o = [], 0
        for s, sh in zip(sizes, shapes):
            out.append(v[o:o + s].reshape(sh))
            o += s
        return jax.tree_util.tree_unflatten(treedef, out)
    return vec, unflatten


def odeint_rk45(
    func: Callable,
    y0,
    t0: float,
    t1: float,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 20_000,
    first_step: float = 1e-4,
) -> Tuple[object, jax.Array]:
    """Integrate dy/dt = func(y, t) from t0 to t1 (either direction).

    y0 is any pytree; returns (y(t1), nfe). jit/vmap/pjit-safe: the loop is a
    `lax.while_loop` with scipy-flavoured PI-free step control.
    """
    y0_vec, unflatten = _flat(y0)
    direction = 1.0 if t1 >= t0 else -1.0
    span = abs(float(t1) - float(t0))

    def f(vec, t):
        dy, _ = _flat(func(unflatten(vec), t))
        return dy

    a = jnp.asarray(_A, jnp.float32)
    c = jnp.asarray(_C, jnp.float32)
    b5 = jnp.asarray(_B5, jnp.float32)
    e = jnp.asarray(_E, jnp.float32)

    def step(y, t, h, k0):
        ks = jnp.zeros((7, y.shape[0]), y.dtype).at[0].set(k0)

        def stage(i, ks):
            yi = y + h * (a[i, :7] @ ks)
            return ks.at[i].set(f(yi, t + h * c[i]))

        ks = jax.lax.fori_loop(1, 7, stage, ks)
        y_new = y + h * (b5 @ ks)
        err = h * (e @ ks)
        return y_new, err, ks[6]  # FSAL: k7 == f(y_new, t+h)

    def cond(state):
        t, _, _, _, n, done = state
        return jnp.logical_and(~done, n < max_steps)

    def body(state):
        t, y, h, k0, n, _ = state
        # clamp the step to not overshoot t1
        h = direction * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
        y_new, err, k_last = step(y, t, h, k0)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        accept = err_norm <= 1.0
        factor = jnp.clip(0.9 * (err_norm + 1e-16) ** (-0.2), 0.2, 10.0)
        h_next = h * factor
        t = jnp.where(accept, t + h, t)
        y = jnp.where(accept, y_new, y)
        k0 = jnp.where(accept, k_last, k0)
        # span-relative termination: an absolute fp32 test near small t1
        # (e.g. 1e-3) is unreachable and would spin until max_steps
        done = jnp.abs(t - t1) <= 1e-6 * span
        return (t, y, h_next, k0, n + 1, done)

    k0 = f(y0_vec, jnp.float32(t0))
    h0 = direction * jnp.abs(jnp.float32(first_step))
    state = (jnp.float32(t0), y0_vec, h0, k0, jnp.int32(0),
             jnp.asarray(False))
    t, y, _, _, n_steps, _ = jax.lax.while_loop(cond, body, state)
    # nfe: 6 fresh stages per attempted step (FSAL reuses the 7th) + 1 initial
    return unflatten(y), 6 * n_steps + 1
