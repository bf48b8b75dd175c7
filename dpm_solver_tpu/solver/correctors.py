"""Corrector hooks: dynamic thresholding and user-pluggable x0/xt correctors.

(ref: dpm_solver_pytorch.py:408-425 dynamic_thresholding_fn; the hooks are
consumed at :1180-1241.)
"""

from __future__ import annotations

import jax.numpy as jnp

from dpm_solver_tpu.utils.trees import bcast_right


def make_dynamic_thresholding(ratio: float = 0.995, max_val: float = 1.0):
    """Imagen dynamic thresholding: clamp x0 to its per-sample `ratio`-quantile
    of |x0| (floored at `max_val`) and rescale into [-1, 1]."""

    def dynamic_thresholding_fn(x0, t=None):
        del t
        s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), ratio, axis=1)
        s = jnp.maximum(s, max_val)
        s = bcast_right(s, x0.ndim)
        return jnp.clip(x0, -s, s) / s

    return dynamic_thresholding_fn
