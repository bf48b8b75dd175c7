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


# ---------------------------------------------------------------------------
# torch score_sde checkpoints (examples/score_sde_pytorch)
# ---------------------------------------------------------------------------

def _t_lin(m, name):
    return {"kernel": np.asarray(m[f"{name}.weight"]).T,
            "bias": np.asarray(m[f"{name}.bias"])}


def _t_conv(m, name):
    return {"kernel": np.transpose(np.asarray(m[f"{name}.weight"]),
                                   (2, 3, 1, 0)),
            "bias": np.asarray(m[f"{name}.bias"])}


def _t_gn(m, name=""):
    p = (name + ".") if name else ""
    return {"scale": np.asarray(m[f"{p}weight"]),
            "bias": np.asarray(m[f"{p}bias"])}


def _t_nin(m, name):
    return {"W": np.asarray(m[f"{name}.W"]), "b": np.asarray(m[f"{name}.b"])}


def _t_resblock(m):
    out = {"GroupNorm_0": _t_gn(m, "GroupNorm_0"),
           "Conv_0": _t_conv(m, "Conv_0"),
           "GroupNorm_1": _t_gn(m, "GroupNorm_1"),
           "Conv_1": _t_conv(m, "Conv_1")}
    if "Dense_0.weight" in m:
        out["Dense_0"] = _t_lin(m, "Dense_0")
    if "Conv_2.weight" in m:
        out["Conv_2"] = _t_conv(m, "Conv_2")
    if "NIN_0.W" in m:
        out["NIN_0"] = _t_nin(m, "NIN_0")
    return out


def _t_attn(m):
    out = {"GroupNorm_0": _t_gn(m, "GroupNorm_0")}
    for i in range(4):
        out[f"NIN_{i}"] = _t_nin(m, f"NIN_{i}")
    return out


def _t_resample(m):
    if "Conv2d_0.weight" in m:  # StyleGAN2 fused FIR conv
        return {"Conv2d_0": {
            "weight": np.transpose(np.asarray(m["Conv2d_0.weight"]),
                                   (2, 3, 1, 0)),
            "bias": np.asarray(m["Conv2d_0.bias"])}}
    if "Conv_0.weight" in m:
        return {"Conv_0": _t_conv(m, "Conv_0")}
    return None  # param-less FIR resample


def reference_tree_from_torch(state_dict: Mapping, cfg: NCSNppConfig) -> dict:
    """torch score_sde NCSN++ state dict -> the reference flax-style tree
    `params_from_reference` consumes.

    The torch model registers every layer in `all_modules` in constructor
    order (score_sde_pytorch/models/ncsnpp.py:70-229) with the SAME
    submodule names as the flax port (GroupNorm_0/Conv_0/NIN_i/Dense_0/
    Conv2d_0, layerspp.py) — so conversion is a replay of that sequence,
    mapping per-class flax auto-numbering onto sequential torch indices.
    Two asymmetries: the progressive pyramid resamples that flax numbers as
    (param-less) modules are plain attributes in torch (`pyramid_upsample`/
    `pyramid_downsample`, ncsnpp.py:102-115) and consume NO torch index,
    while still bumping the flax class counter; and the `sigmas` buffer is
    solver state, not a weight.
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k):
          np.asarray(v) for k, v in state_dict.items()}

    # group by all_modules index
    mods: dict = collections.defaultdict(dict)
    for k, v in sd.items():
        if not k.startswith("all_modules."):
            continue
        _, i, rest = k.split(".", 2)
        mods[int(i)][rest] = v
    n_mods = (max(mods) + 1) if mods else 0

    counters: dict = collections.defaultdict(int)
    idx = 0
    ref: dict = {}

    def next_mod():
        nonlocal idx
        m = mods.get(idx, {})
        idx += 1
        return m

    def emit(kind, subtree):
        name = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        if subtree is not None:
            ref[name] = subtree

    def skip_flax(kind):
        counters[kind] += 1  # flax phantom module: counter only

    biggan = cfg.resblock_type == "biggan"
    rb = "ResnetBlockBigGANpp" if biggan else "ResnetBlockDDPMpp"
    levels = len(cfg.ch_mult)
    res_at = [cfg.image_size // (2 ** i) for i in range(levels)]

    def bare_lin(m):
        return {"kernel": np.asarray(m["weight"]).T,
                "bias": np.asarray(m["bias"])}

    def bare_conv(m):
        return {"kernel": np.transpose(m["weight"], (2, 3, 1, 0)),
                "bias": m["bias"]}

    if cfg.embedding_type == "fourier":
        emit("GaussianFourierProjection", {"W": next_mod()["W"]})
    if cfg.conditional:
        emit("Dense", bare_lin(next_mod()))
        emit("Dense", bare_lin(next_mod()))
    emit("Conv", bare_conv(next_mod()))

    for i in range(levels):
        for _ in range(cfg.num_res_blocks):
            emit(rb, _t_resblock(next_mod()))
            if res_at[i] in cfg.attn_resolutions:
                emit("AttnBlockpp", _t_attn(next_mod()))
        if i == levels - 1:
            continue
        if biggan:
            emit(rb, _t_resblock(next_mod()))
        else:
            emit("Downsample", _t_resample(next_mod()))
        if cfg.progressive_input == "input_skip":
            skip_flax("Downsample")  # torch pyramid_downsample is an attr
            emit("Combine", {"Conv_0": _t_conv(next_mod(), "Conv_0")})
        elif cfg.progressive_input == "residual":
            emit("Downsample", _t_resample(next_mod()))

    emit(rb, _t_resblock(next_mod()))
    emit("AttnBlockpp", _t_attn(next_mod()))
    emit(rb, _t_resblock(next_mod()))

    for i in reversed(range(levels)):
        for _ in range(cfg.num_res_blocks + 1):
            emit(rb, _t_resblock(next_mod()))
        if res_at[i] in cfg.attn_resolutions:
            emit("AttnBlockpp", _t_attn(next_mod()))
        if cfg.progressive != "none":
            if i == levels - 1:
                emit("GroupNorm", _t_gn(next_mod()))
                emit("Conv", bare_conv(next_mod()))
            elif cfg.progressive == "output_skip":
                skip_flax("Upsample")  # torch pyramid_upsample is an attr
                emit("GroupNorm", _t_gn(next_mod()))
                emit("Conv", bare_conv(next_mod()))
            elif cfg.progressive == "residual":
                emit("Upsample", _t_resample(next_mod()))
        if i != 0:
            if biggan:
                emit(rb, _t_resblock(next_mod()))
            else:
                emit("Upsample", _t_resample(next_mod()))

    if cfg.progressive != "output_skip":
        emit("GroupNorm", _t_gn(next_mod()))
        emit("Conv", bare_conv(next_mod()))

    if idx != n_mods:
        raise ValueError(
            f"torch checkpoint has {n_mods} modules; the {cfg.resblock_type}/"
            f"{cfg.progressive}/{cfg.progressive_input} walk consumed {idx} "
            "— config does not match the checkpoint")
    return ref


def params_from_torch(state_dict: Mapping, cfg: NCSNppConfig) -> dict:
    """torch score_sde NCSN++ state dict -> our NCSNpp params."""
    return params_from_reference(reference_tree_from_torch(state_dict, cfg),
                                 cfg)


def load_score_sde_torch_checkpoint(path: str, cfg: NCSNppConfig,
                                    *, use_ema: bool = True) -> dict:
    """score_sde_pytorch checkpoint file -> our NCSNpp params.

    The torch pipeline saves `dict(optimizer=…, model=…, ema=…, step=…)`
    (score_sde_pytorch/run_lib.py save logic; `ema` holds
    ExponentialMovingAverage state whose `shadow_params` is a LIST ordered
    by `model.parameters()` — trainable params only, which excludes the
    `sigmas` buffer and, for fourier models, the frozen
    GaussianFourierProjection.W). `use_ema` substitutes those shadow values
    before conversion, mirroring the reference's sampling-time
    `ema.copy_to(model.parameters())`."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = d["model"] if isinstance(d, dict) and "model" in d else d
    sd = {(k[len("module."):] if k.startswith("module.") else k):
          np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in model_sd.items()}

    ema = d.get("ema") if isinstance(d, dict) else None
    if use_ema and isinstance(ema, dict) and "shadow_params" in ema:
        frozen = {"sigmas"}
        if cfg.embedding_type == "fourier":
            frozen.add("all_modules.0.W")
        names = [k for k in sd if k not in frozen]
        shadow = ema["shadow_params"]
        if len(names) != len(shadow):
            raise ValueError(
                f"EMA shadow list has {len(shadow)} entries but the model "
                f"has {len(names)} trainable params")
        for k, v in zip(names, shadow):
            sd[k] = np.asarray(v.detach() if hasattr(v, "detach") else v)
    return params_from_torch(sd, cfg)
