"""LPIPS perceptual distance (VGG16 backbone), TPU-native NHWC.

Behavioral twin of the `taming.modules.losses.lpips.LPIPS` network the
reference's first-stage losses import (referenced from
examples/stable-diffusion/ldm/modules/losses/contperceptual.py:17 and
vqperceptual.py:57; the `taming` package itself is an external dependency of
the reference, not vendored in its tree). Semantics reproduced from the
published LPIPS definition (Zhang et al., arXiv:1801.03924, `lpips`/"taming"
lineage):

  * inputs in [-1, 1]; ScalingLayer with the fixed shift/scale constants,
  * torchvision VGG16 `features` trunk, tapped after relu1_2 / relu2_2 /
    relu3_3 / relu4_3 / relu5_3,
  * per-position channel unit-normalization (eps 1e-10) of each tap,
  * squared difference -> 1x1 bias-free linear head per tap -> spatial
    mean -> sum over the five taps.

Weights: published LPIPS uses the torchvision-pretrained VGG16 plus trained
lin heads. This image has zero egress, so `convert_torch_lpips` maps a
torch state dict (torchvision `features.{i}.*` naming plus `lin{k}`) into
our tree; tests pin the layout with a randomized torch-functional twin
(`tests/test_lpips.py`), the same discipline as the Inception port.

TPU notes: the whole distance is five conv stacks feeding the MXU —
everything jits into one program. Compute dtype is configurable (bf16 safe:
the unit-normalization and the final means run in fp32).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# RGB shift/scale constants of the LPIPS ScalingLayer (fixed buffers in the
# published network; not learned).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision VGG16 `features` conv indices per slice, with channel widths.
_VGG_SLICES: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)
LPIPS_CHANNELS: Tuple[int, ...] = tuple(s[-1][1] for s in _VGG_SLICES)


class VGG16Features(nn.Module):
    """VGG16 `features` trunk returning the five LPIPS taps (NHWC).

    Maxpool between slices: 2x2/2 (torch `MaxPool2d(2, 2)`, floor mode).
    """

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        x = x.astype(self.compute_dtype)
        for si, slice_convs in enumerate(_VGG_SLICES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for idx, width in slice_convs:
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.compute_dtype,
                            name=f"conv{idx}")(x)
                x = jax.nn.relu(x)
            taps.append(x)
        return tuple(taps)


def _unit_normalize(x, eps=1e-10):
    """Channel-unit-normalize per spatial position (LPIPS
    `normalize_tensor`: x / (||x||_channel + eps))."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance d(x, y), inputs NHWC RGB in [-1, 1].

    Returns shape (B, 1, 1, 1) so it broadcasts against a per-pixel
    reconstruction loss exactly like the torch version does in
    contperceptual.py:50-51 (NCHW (B,1,1,1) there).
    """

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = VGG16Features(compute_dtype=self.compute_dtype, name="vgg")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for k, (tx, ty) in enumerate(zip(fx, fy)):
            diff = jnp.square(_unit_normalize(tx) - _unit_normalize(ty))
            # NetLinLayer: 1x1 conv, one output channel, no bias (dropout is
            # identity in eval mode, which is the only mode LPIPS runs in).
            w = self.param(f"lin{k}", nn.initializers.constant(1.0),
                           (diff.shape[-1],), jnp.float32)
            score = jnp.sum(diff * w, axis=-1, keepdims=True)
            total = total + jnp.mean(score, axis=(1, 2), keepdims=True)
        return total


def convert_torch_lpips(state_dict: Dict[str, Any]) -> dict:
    """Torch LPIPS state dict -> our param tree.

    Accepts either taming-style keys (`net.slice{s}.{i}.weight`,
    `lin{k}.model.1.weight`) or a plain torchvision VGG16
    (`features.{i}.weight`) merged with `lin{k}.weight` heads. Conv kernels
    OIHW -> HWIO.
    """

    def _get(*names):
        for n in names:
            if n in state_dict:
                return np.asarray(state_dict[n])
        raise KeyError(f"none of {names} in state dict")

    params: Dict[str, Any] = {"vgg": {}}
    for si, slice_convs in enumerate(_VGG_SLICES):
        for idx, _ in slice_convs:
            # taming's vgg16 wrapper keeps torchvision's global layer
            # indices inside each slice module, so both namings share `idx`.
            w = _get(f"features.{idx}.weight", f"net.slice{si + 1}.{idx}.weight")
            b = _get(f"features.{idx}.bias", f"net.slice{si + 1}.{idx}.bias")
            params["vgg"][f"conv{idx}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
    for k in range(len(_VGG_SLICES)):
        w = _get(f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                 f"lin{k}.weight")
        params[f"lin{k}"] = jnp.asarray(w.reshape(-1))
    return {"params": params}
