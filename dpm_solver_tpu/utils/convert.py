"""PyTorch checkpoint -> Flax parameter conversion.

Converts reference-format state dicts (NCHW torch) into our NHWC Flax models'
parameter pytrees. Layout rules:
  Conv2d  weight [O, I, kH, kW] -> kernel [kH, kW, I, O]
  Linear  weight [O, I]         -> kernel [I, O]
  GroupNorm weight/bias         -> scale/bias (nested under the 'norm' leaf)

The DDPM UNet module names were chosen to mirror the reference torch module
tree (models/diffusion.py), so conversion is a pure name rewrite plus the
layout transposes above.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str, *,
                          prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: np.ndarray} dict.

    Handles the reference's list-style checkpoints
    (runners/diffusion.py: torch.save([model_sd, opt_sd, epoch, step, ema_sd]))
    as well as plain state dicts and {'state_dict': ...} wrappers. For
    list checkpoints the EMA shadow (the trailing dict) is overlaid on the
    raw weights by default — the reference samples from EMA weights when
    `model.ema` is set (runners/diffusion.py:337-341); pass
    `prefer_ema=False` for the raw training weights.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        dicts = [x for x in obj if isinstance(x, Mapping)
                 and any(hasattr(v, "detach") for v in x.values())]
        base = dict(dicts[0]) if dicts else {}
        if prefer_ema and len(dicts) > 1:
            # EMA shadows hold parameters only (no buffers): overlay
            base.update(dicts[-1])
        obj = base
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _set(tree: dict, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


_NORM_NAMES = {"norm", "norm1", "norm2", "norm_out"}


def convert_ddpm_unet(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference DDPM UNet state dict -> DDPMUNet flax params."""
    params: dict = {}
    for key, val in state_dict.items():
        if key == "logvar":  # 'bayesian' training artifact; unused at sampling
            continue
        parts = key.split(".")
        leaf = parts[-1]  # weight | bias
        mods = parts[:-1]

        # ---- module-path rewrite to our flat names ----
        if mods[0] == "temb":
            flax_mod = [f"temb_dense{mods[2]}"]
            rest = []
        elif mods[0] in ("down", "up"):
            lvl = mods[1]
            kind = mods[2]  # block | attn | downsample | upsample
            if kind in ("block", "attn"):
                flax_mod = [f"{mods[0]}_{lvl}_{kind}_{mods[3]}"]
                rest = mods[4:]
            else:
                flax_mod = [f"{mods[0]}_{lvl}_{kind}"]
                rest = mods[3:]
        elif mods[0] == "mid":
            flax_mod = [f"mid_{mods[1]}"]
            rest = mods[2:]
        else:  # conv_in, conv_out, norm_out
            flax_mod = [mods[0]]
            rest = mods[1:]
        flax_mod += rest

        # ---- leaf conversion ----
        arr = np.asarray(val)
        last = flax_mod[-1] if flax_mod else ""
        if last in _NORM_NAMES or (not flax_mod and parts[0] in _NORM_NAMES):
            # GroupNorm32 wraps nn.GroupNorm under a child called 'norm'
            name = "scale" if leaf == "weight" else "bias"
            _set(params, flax_mod + ["norm", name], arr)
        elif leaf == "weight":
            if arr.ndim == 4:
                _set(params, flax_mod + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                _set(params, flax_mod + ["kernel"], arr.transpose(1, 0))
            else:
                raise ValueError(f"unexpected weight rank for {key}: {arr.shape}")
        elif leaf == "bias":
            _set(params, flax_mod + ["bias"], arr)
        else:
            raise ValueError(f"unexpected leaf {key}")
    return {"params": params}


# --------------------------------------------------------------------------- #
# ADM / guided-diffusion / improved-DDPM UNets
# --------------------------------------------------------------------------- #


def _t_conv2d(sd, src):
    return {"kernel": np.asarray(sd[src + ".weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[src + ".bias"])}


def _t_conv1d(sd, src):
    w = np.asarray(sd[src + ".weight"])  # (O, I, 1)
    return {"kernel": w[:, :, 0].transpose(1, 0),
            "bias": np.asarray(sd[src + ".bias"])}


def _t_dense(sd, src):
    return {"kernel": np.asarray(sd[src + ".weight"]).transpose(1, 0),
            "bias": np.asarray(sd[src + ".bias"])}


def _t_gn(sd, src):
    return {"norm": {"scale": np.asarray(sd[src + ".weight"]),
                     "bias": np.asarray(sd[src + ".bias"])}}


def _t_affine(sd, src):
    """LayerNorm / bare GroupNorm affine params (not wrapped in GroupNorm32)."""
    return {"scale": np.asarray(sd[src + ".weight"]),
            "bias": np.asarray(sd[src + ".bias"])}


def _t_xattn(sd, src):
    """CrossAttention: bias-free q/k/v, biased out proj (attention.py:161-168)."""
    out = {}
    for leaf in ("to_q", "to_k", "to_v"):
        out[leaf] = {"kernel":
                     np.asarray(sd[f"{src}.{leaf}.weight"]).transpose(1, 0)}
    out["to_out"] = _t_dense(sd, src + ".to_out.0")
    return out


def convert_adm_unet(state_dict, config, classifier: bool = False) -> dict:
    """guided-diffusion / improved-DDPM torch state dict -> ADMUNet /
    ADMClassifier flax params. Driven by the same `layout()` walk the flax
    modules use, so torch module indices line up by construction
    (ref unet.py:480-616 / improved_ddpm/unet.py:321-461)."""
    from dpm_solver_tpu.models.adm_unet import layout

    sd = state_dict
    plan = layout(config, encoder_only=classifier)
    p: dict = {}

    def put_layer(my_name, spec, src):
        kind = spec["kind"]
        if kind == "conv_in":
            p[my_name] = _t_conv2d(sd, src)
        elif kind == "res":
            blk = {
                "in_norm": _t_gn(sd, src + ".in_layers.0"),
                "in_conv": _t_conv2d(sd, src + ".in_layers.2"),
                "emb_proj": _t_dense(sd, src + ".emb_layers.1"),
                "out_norm": _t_gn(sd, src + ".out_layers.0"),
                "out_conv": _t_conv2d(sd, src + ".out_layers.3"),
            }
            if src + ".skip_connection.weight" in sd:
                # always a conv2d weight, kernel 1x1 or 3x3 (unet.py:215-222)
                blk["skip"] = _t_conv2d(sd, src + ".skip_connection")
            p[my_name] = blk
        elif kind == "attn":
            p[my_name] = {
                "norm": _t_gn(sd, src + ".norm"),
                "qkv": _t_conv1d(sd, src + ".qkv"),
                "proj_out": _t_conv1d(sd, src + ".proj_out"),
            }
        elif kind == "xattn":
            # SD-2.x 'linear' transformers store proj_in/out as Linear
            # (rank-2) instead of 1x1 Conv2d (rank-4)
            def proj(leafsrc):
                return (_t_dense(sd, leafsrc)
                        if np.asarray(sd[leafsrc + ".weight"]).ndim == 2
                        else _t_conv2d(sd, leafsrc))

            blk = {
                "norm": _t_affine(sd, src + ".norm"),
                "proj_in": proj(src + ".proj_in"),
                "proj_out": proj(src + ".proj_out"),
            }
            for d in range(spec["depth"]):
                t = f"{src}.transformer_blocks.{d}"
                blk[f"block_{d}"] = {
                    "norm1": _t_affine(sd, t + ".norm1"),
                    "norm2": _t_affine(sd, t + ".norm2"),
                    "norm3": _t_affine(sd, t + ".norm3"),
                    "attn1": _t_xattn(sd, t + ".attn1"),
                    "attn2": _t_xattn(sd, t + ".attn2"),
                    "ff": {"proj": _t_dense(sd, t + ".ff.net.0.proj"),
                           "out": _t_dense(sd, t + ".ff.net.2")},
                }
            p[my_name] = blk
        elif kind == "resample":
            leaf = "conv" if spec["direction"] == "up" else "op"
            if spec["with_conv"]:
                p[my_name] = {"conv": _t_conv2d(sd, f"{src}.{leaf}")}
        else:
            raise ValueError(kind)

    p["time_embed_0"] = _t_dense(sd, "time_embed.0")
    p["time_embed_2"] = _t_dense(sd, "time_embed.2")
    if "label_emb.weight" in sd:
        p["label_emb"] = {"embedding": np.asarray(sd["label_emb.weight"])}

    for n, layers in enumerate(plan["input_blocks"]):
        for m, spec in enumerate(layers):
            put_layer(f"input_blocks_{n}_{m}", spec, f"input_blocks.{n}.{m}")
    for m, spec in enumerate(plan["middle"]):
        put_layer(f"middle_block_{m}", spec, f"middle_block.{m}")
    for n, layers in enumerate(plan["output_blocks"]):
        for m, spec in enumerate(layers):
            put_layer(f"output_blocks_{n}_{m}", spec, f"output_blocks.{n}.{m}")

    if not classifier:
        p["out_norm"] = _t_gn(sd, "out.0")
        p["out_conv"] = _t_conv2d(sd, "out.2")
    elif config.pool == "adaptive":
        p["out_norm"] = _t_gn(sd, "out.0")
        p["out_conv"] = _t_conv2d(sd, "out.3")
    elif config.pool == "attention":
        p["out_norm"] = _t_gn(sd, "out.0")
        p["out_pool"] = {
            "positional_embedding":
                np.asarray(sd["out.2.positional_embedding"]).transpose(1, 0),
            "qkv_proj": _t_conv1d(sd, "out.2.qkv_proj"),
            "c_proj": _t_conv1d(sd, "out.2.c_proj"),
        }
    elif config.pool == "spatial":
        p["out_fc0"] = _t_dense(sd, "out.0")
        p["out_fc1"] = _t_dense(sd, "out.2")
    elif config.pool == "spatial_v2":
        p["out_fc0"] = _t_dense(sd, "out.0")
        p["out_norm"] = _t_gn(sd, "out.1")
        p["out_fc1"] = _t_dense(sd, "out.3")
    return {"params": p}
