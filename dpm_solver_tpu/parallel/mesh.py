"""Device-mesh construction and the pjit-sharded batch sampler.

TPU-native replacement for the reference's data-parallel orchestration:
  * torch side: one process per GPU + NCCL init + rank-sharded sample counts
    (ddpm_and_guided-diffusion/main.py:243-277, runners/diffusion.py:407-457)
  * jax side: `jax.pmap(...)` closures (score_sde_jax/sampling.py:539-592)

Here a single controller lays out one `jax.sharding.Mesh` with a `data` axis
over ICI (and optionally a `pod` axis over DCN for multi-host slices),
pjit-shards the batch dimension of x_T/rng, and replicates parameters. XLA
inserts the collectives; sampling is embarrassingly parallel so the only
cross-chip traffic is the adaptive controller's error max (lax.pmax via the
sharded jnp.max).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a Mesh over `devices` (default: all).

    With the default single axis, all devices form one data-parallel ring on
    ICI. Pass shape=(n_pods, chips_per_pod) + axis_names=("pod", "data") to
    split DCN from ICI on multi-slice topologies.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    assert shape is not None, "explicit shape required for multi-axis meshes"
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_sharded_sampler(
    sample_fn: Callable,
    mesh: Mesh,
    *,
    axis: str = "data",
    donate_x: bool = True,
) -> Callable:
    """jit `sample_fn(x, rng) -> x0` with the batch sharded over the mesh.

    `sample_fn` is a pure trajectory closure from `build_sampler` (model
    params already bound) — the whole multi-NFE trajectory stays one XLA
    program per chip with zero collectives. Closed-over weights are hoisted
    to replicated jit arguments (embedded dense constants would inflate the
    program by the full parameter size; see sample._jit_hoisting_constants).
    """
    from jax import core as jcore

    data_in = batch_sharding(mesh, axis)
    cache = {}

    def _build(x, rng):
        out_tree = [None]

        def flat_fn(xx, rr):
            flat, out_tree[0] = jax.tree_util.tree_flatten(sample_fn(xx, rr))
            return flat

        closed = jax.make_jaxpr(flat_fn)(x, rng)
        jfn = jax.jit(
            lambda xx, rr, *cs: jcore.eval_jaxpr(closed.jaxpr, cs, xx, rr),
            in_shardings=(data_in, None) + (None,) * len(closed.consts),
            out_shardings=data_in,
            donate_argnums=(0,) if donate_x else (),
        )
        return jfn, closed.consts, out_tree[0]

    def sampler(x, rng=None):
        x = jax.device_put(x, data_in)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        key = (x.shape, str(x.dtype))
        if key not in cache:
            cache[key] = _build(x, rng)
        jfn, consts, tree = cache[key]
        return jax.tree_util.tree_unflatten(tree, jfn(x, rng, *consts))

    return sampler
