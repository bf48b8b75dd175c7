"""Convert reference score_sde NCSN++ parameter trees to our layout.

The reference flax model (examples/score_sde_jax/models/ncsnpp.py) names every
submodule by flax auto-numbering in call order (ResnetBlockBigGANpp_17,
Conv_1, ...) — the layout of the published score_sde JAX checkpoints. This
module replays the architecture walk for a given `NCSNppConfig`, consuming
reference type counters in creation order and emitting our explicitly-named
tree (models/ncsnpp.py), including:

  * three NIN q/k/v projections -> one fused (C, 3C) `qkv` Dense,
  * NIN shortcuts -> 1x1 conv kernels,
  * StyleGAN2 Conv2d `weight` -> `kernel`,
  * param-less reference modules (FIR resamples) still consume a counter.
"""

from __future__ import annotations

import collections
from typing import Mapping

import numpy as np

from dpm_solver_tpu.models.ncsnpp import NCSNppConfig


def _nin_to_dense(nin):
    return {"kernel": np.asarray(nin["W"]), "bias": np.asarray(nin["b"])}


def _nin_to_conv1x1(nin):
    w = np.asarray(nin["W"])
    return {"kernel": w[None, None], "bias": np.asarray(nin["b"])}


def _attn(sub):
    qkv_w = np.concatenate([np.asarray(sub[f"NIN_{i}"]["W"]) for i in range(3)],
                           axis=-1)
    qkv_b = np.concatenate([np.asarray(sub[f"NIN_{i}"]["b"]) for i in range(3)])
    return {
        "norm": dict(sub["GroupNorm_0"]),
        "qkv": {"kernel": qkv_w, "bias": qkv_b},
        "proj": _nin_to_dense(sub["NIN_3"]),
    }


def _resblock(sub):
    out = {
        "norm1": dict(sub["GroupNorm_0"]),
        "conv1": dict(sub["Conv_0"]),
        "norm2": dict(sub["GroupNorm_1"]),
        "conv2": dict(sub["Conv_1"]),
    }
    if "Dense_0" in sub:
        out["temb_proj"] = dict(sub["Dense_0"])
    if "Conv_2" in sub:
        out["shortcut"] = dict(sub["Conv_2"])
    elif "NIN_0" in sub:
        out["shortcut"] = _nin_to_conv1x1(sub["NIN_0"])
    return out


def _resample(sub):
    """layerspp.Upsample/Downsample subtree -> our Resample subtree."""
    if sub is None:
        return None  # param-less FIR resample
    if "Conv2d_0" in sub:  # StyleGAN2 fused resample conv
        c = sub["Conv2d_0"]
        return {"kernel": np.asarray(c["weight"]), "bias": np.asarray(c["bias"])}
    if "Conv_0" in sub:
        return {"conv": dict(sub["Conv_0"])}
    return None


def params_from_reference(ref_params: Mapping, cfg: NCSNppConfig) -> dict:
    """Reference score_sde_jax NCSN++ params -> our NCSNpp params."""
    ref = ref_params.get("params", ref_params)
    counters: dict = collections.defaultdict(int)
    biggan = cfg.resblock_type == "biggan"
    rb_type = "ResnetBlockBigGANpp" if biggan else "ResnetBlockDDPMpp"

    def take(kind, *, optional=False):
        name = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        if name not in ref:
            if optional:
                return None
            raise KeyError(f"reference tree is missing {name}")
        return ref[name]

    out: dict = {}
    levels = len(cfg.ch_mult)
    res_at = [cfg.image_size // (2 ** i) for i in range(levels)]

    if cfg.embedding_type == "fourier":
        out["fourier"] = {"W": np.asarray(take("GaussianFourierProjection")["W"])}
    if cfg.conditional:
        out["time_embed_0"] = dict(take("Dense"))
        out["time_embed_1"] = dict(take("Dense"))
    out["conv_in"] = dict(take("Conv"))

    for i in range(levels):
        for j in range(cfg.num_res_blocks):
            out[f"down_{i}_block_{j}"] = _resblock(take(rb_type))
            if res_at[i] in cfg.attn_resolutions:
                out[f"down_{i}_attn_{j}"] = _attn(take("AttnBlockpp"))
        if i == levels - 1:
            continue
        if biggan:
            out[f"down_{i}_resample"] = _resblock(take(rb_type))
        else:
            out[f"down_{i}_resample"] = _resample(take("Downsample"))
        if cfg.progressive_input == "input_skip":
            take("Downsample", optional=True)  # param-less FIR pyramid
            out[f"down_{i}_combine"] = dict(take("Combine")["Conv_0"])
        elif cfg.progressive_input == "residual":
            out[f"down_{i}_pyr"] = _resample(take("Downsample"))

    out["mid_block_1"] = _resblock(take(rb_type))
    out["mid_attn"] = _attn(take("AttnBlockpp"))
    out["mid_block_2"] = _resblock(take(rb_type))

    for i in reversed(range(levels)):
        for j in range(cfg.num_res_blocks + 1):
            out[f"up_{i}_block_{j}"] = _resblock(take(rb_type))
        if res_at[i] in cfg.attn_resolutions:
            out[f"up_{i}_attn"] = _attn(take("AttnBlockpp"))
        if cfg.progressive != "none":
            if i != levels - 1:
                up_sub = take("Upsample", optional=True)
                if cfg.progressive == "residual":
                    out[f"up_{i}_pyr_up"] = _resample(up_sub)
            if i == levels - 1 or cfg.progressive == "output_skip":
                out[f"up_{i}_pyr_norm"] = dict(take("GroupNorm"))
                out[f"up_{i}_pyr_conv"] = dict(take("Conv"))
        if i != 0:
            if biggan:
                out[f"up_{i}_resample"] = _resblock(take(rb_type))
            else:
                out[f"up_{i}_resample"] = _resample(take("Upsample"))

    if cfg.progressive != "output_skip":
        out["norm_out"] = dict(take("GroupNorm"))
        out["conv_out"] = dict(take("Conv"))

    out = {k: v for k, v in out.items() if v is not None}
    return {"params": out}


def load_score_sde_checkpoint(path: str):
    """score_sde_jax flax checkpoint file -> the reference EMA params tree.

    The reference saves its `State` dataclass (models/utils.py:32-40) via
    flax.training.checkpoints; the raw file is msgpack of the State pytree.
    Sampling uses the EMA parameters (`params_ema`, run_lib.py:389-398);
    falls back to the optimizer target when a checkpoint lacks them.
    Feed the result to :func:`params_from_reference`.
    """
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if "params_ema" in tree:
        return tree["params_ema"]
    opt = tree.get("optimizer", {})
    for key in ("target", "params"):
        if isinstance(opt, dict) and key in opt:
            node = opt[key]
            return node.get("params", node) if isinstance(node, dict) else node
    raise ValueError(f"unrecognized score_sde checkpoint structure: "
                     f"{sorted(tree)[:8]}")
