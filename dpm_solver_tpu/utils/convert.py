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


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: np.ndarray} dict.

    Handles the reference's list-style checkpoints
    (runners/diffusion.py: torch.save([model_sd, opt_sd, epoch, step, ema_sd]))
    as well as plain state dicts and {'state_dict': ...} wrappers.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        obj = obj[0]
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
