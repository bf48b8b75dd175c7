"""Small array/pytree helpers."""

from __future__ import annotations

import jax.numpy as jnp


def bcast_right(v, ndim: int):
    """Append trailing singleton dims to `v` until it has `ndim` dims.

    Per-batch scalars (B,) broadcast against (B, H, W, C) activations.
    (ref semantics: expand_dims, dpm_solver_pytorch.py:1295-1305)
    """
    v = jnp.asarray(v)
    if v.ndim > ndim:
        raise ValueError(f"cannot broadcast ndim {v.ndim} -> {ndim}")
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))
