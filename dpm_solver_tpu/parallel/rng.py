"""RNG discipline for multi-chip / multi-host sampling.

Replaces the reference's per-rank seeding (`torch.manual_seed(seed + rank)`,
ddpm_and_guided-diffusion/main.py:262-265; `jax.random.fold_in(rng,
jax.host_id())`, score_sde_jax/run_lib.py:144) with JAX's partitionable
threefry: a single logical key produces identical global batches regardless
of mesh shape, so runs are reproducible across topologies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_process_key(key: jax.Array) -> jax.Array:
    """Fold in the process index (multi-host: distinct host-local streams)."""
    return jax.random.fold_in(key, jax.process_index())


def sample_noise(key: jax.Array, shape, dtype=jnp.float32, sharding=None):
    """x_T ~ N(0, I), optionally laid out directly into a sharding.

    With `jax_threefry_partitionable` (default in modern JAX) the result is
    bitwise identical for any sharding of the same global shape.
    """
    x = jax.random.normal(key, shape, dtype)
    if sharding is not None:
        x = jax.lax.with_sharding_constraint(x, sharding)
    return x
