"""Tensor-parallel sharding rules for the attention/MLP-heavy UNets.

The reference is data-parallel only (SURVEY.md §2.6) — its models fit on one
device. For SDXL-class UNets, this module adds the parity-plus extension the
survey calls out: Megatron-style tensor parallelism over a 2-D
(data, model) mesh, expressed purely as GSPMD sharding annotations — XLA
inserts the all-reduces; no manual collectives.

Pattern per transformer block:
  * column-parallel: the fused qkv / to_q,to_k,to_v / GEGLU-in kernels shard
    their OUTPUT features over 'model' (each chip computes its own heads /
    MLP slice),
  * row-parallel: the following projection (proj_out / to_out / GEGLU-out)
    shards its INPUT features, producing partial sums that XLA reduces over
    'model' — one all-reduce per block, riding ICI,
  * everything else (convs, norms, time embeddings) replicated: at the
    resolutions where attention dominates FLOPs these are cheap, and
    replicated convs avoid halo exchanges.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module-name patterns -> (kernel spec, bias spec); matched against the
# '/'-joined param path (innermost module name before the leaf)
_COLUMN = re.compile(r"(^|/)(qkv|to_q|to_k|to_v)/|(^|/)ff/proj/")
_ROW = re.compile(r"(^|/)(proj_out|to_out)/|(^|/)ff/out/|(^|/)proj/(?!.*ff)")


def tp_spec_for(path: str, ndim: int, model_axis: str = "model"):
    """PartitionSpec for one parameter, by path."""
    is_kernel = path.endswith("/kernel") or path.endswith("/W")
    is_bias = path.endswith("/bias") or path.endswith("/b")
    if _COLUMN.search(path):
        if is_kernel:
            return P(*([None] * (ndim - 1) + [model_axis]))
        if is_bias:
            return P(model_axis)
    if _ROW.search(path):
        if is_kernel and ndim >= 2:
            # shard the contraction (input) axis -> partial sums all-reduced
            return P(*([None] * (ndim - 2) + [model_axis, None]))
        # row-parallel bias is added after the reduce -> replicated
    return P()


def tp_param_specs(params: Any, model_axis: str = "model") -> Any:
    """Param pytree -> PartitionSpec pytree under the TP rules."""

    def spec(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        return tp_spec_for("/".join(keys), np.ndim(leaf), model_axis)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place a param tree on the mesh under the TP specs."""
    specs = tp_param_specs(params, model_axis)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def make_tp_mesh(devices=None, *, data: Optional[int] = None,
                 model: int = 2) -> Mesh:
    """(data, model) mesh over the given devices; data fills the remainder."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    return Mesh(devices.reshape(data, model), ("data", "model"))


def make_tp_fn(fn, mesh: Mesh, params: Any, *, model_axis: str = "model"):
    """jit `fn(params, x, *args)` with TP-sharded params and batch-sharded x.

    Returns (jitted_fn, sharded_params). GSPMD propagates the annotations
    through the network and inserts the per-block all-reduces."""
    param_specs = tp_param_specs(params, model_axis)
    sharded = shard_params(params, mesh, model_axis)
    x_sharding = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        fn,
        in_shardings=(jax.tree.map(lambda s: NamedSharding(mesh, s),
                                   param_specs), x_sharding),
        out_shardings=x_sharding,
    )
    return jitted, sharded
