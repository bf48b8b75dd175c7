"""ZeRO-1 optimizer-state sharding over the data axis, GSPMD-style.

Beyond the reference (both its torch DDP and jax pmap paths replicate the
full Adam state on every device): on TPU slices the optimizer moments are
the dominant non-activation memory of a data-parallel trainer (2x params in
fp32). Here each moment tensor is sharded over the mesh's data axis along
its largest divisible dimension, while params and grads stay replicated —
the classic ZeRO-1 split, expressed as shardings on the SAME pure train
step: jit with `state_sharding(...)` in/out and XLA partitions the
optimizer update across the axis and all-gathers nothing (the update math
is elementwise over the sharded moments; only the param delta is formed
replicated).

Usage:
    shardings = optstate_shardings(state, mesh)            # pytree
    state = jax.device_put(state, shardings)
    step = jax.jit(step_fn, in_shardings=(shardings, data_sharding, None),
                   out_shardings=(shardings, None))
    # or: step = shard_train_step(step_fn, mesh, state, extra_in=(data, None))
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n_shards: int, min_size: int) -> P:
    """Shard the largest axis divisible by n_shards; replicate tiny or
    indivisible leaves."""
    shape = getattr(leaf, "shape", ())
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % n_shards == 0:
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def optstate_shardings(state, mesh: Mesh, *, axis: str = "data",
                       min_size: int = 2 ** 12):
    """Sharding pytree for a TrainState-like object: optimizer state
    sharded over `axis` (ZeRO-1), everything else replicated.

    Works with any flax.struct/`register_dataclass` state exposing an
    `opt_state` field (training.train.TrainState,
    training.autoencoder.AdversarialTrainState via its two opt fields).
    """
    assert axis in mesh.axis_names
    n = mesh.shape[axis]
    replicated = NamedSharding(mesh, P())

    fields = [f for f in ("opt_state", "gen_opt", "disc_opt")
              if hasattr(state, f)]

    def shard_tree(tree):
        return jax.tree.map(
            lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n, min_size)),
            tree)

    if not fields:
        raise ValueError("state has no optimizer-state field to shard")

    import dataclasses as _dc

    def _replace(obj, **kw):
        return (obj.replace(**kw) if hasattr(obj, "replace")
                else _dc.replace(obj, **kw))

    out = jax.tree.map(lambda _: replicated, state)
    for f in fields:
        out = _replace(out, **{f: shard_tree(getattr(state, f))})
    return out


def shard_train_step(step_fn: Callable, mesh: Mesh, state, *,
                     batch_spec: P = P("data"),
                     n_extra: int = 0,
                     axis: str = "data",
                     min_size: int = 2 ** 12):
    """jit `step_fn(state, batch, *extras) -> (state, metrics)` with ZeRO-1
    state shardings and a data-sharded batch. Returns (jitted_step,
    device_put state, state_shardings)."""
    shardings = optstate_shardings(state, mesh, axis=axis,
                                   min_size=min_size)
    state = jax.device_put(state, shardings)
    data = NamedSharding(mesh, batch_spec)
    jitted = jax.jit(
        step_fn,
        in_shardings=(shardings, data) + (None,) * n_extra,
        out_shardings=(shardings, None),
    )
    return jitted, state, shardings
