"""InceptionV3 (the FID variant) in Flax, NHWC — the standard FID/IS feature
extractor.

Architecture twin of the reference's torch port
(examples/ddpm_and_guided-diffusion/evaluate/inception.py:16-328, itself the
pytorch-fidelity FID network): torchvision InceptionV3 with the FID tweaks —
`count_include_pad=False` average pools in the A/C/E_1 mixed blocks, a
max-pool branch in the final E_2 block, 1008-way logits — plus the
reference's input handling (bilinear resize to 299 and [0,1]->[-1,1]
normalization, inception.py:129-163).

Weights: `convert_fid_inception(state_dict)` maps the published
pt_inception-2015-12-05 checkpoint (FID_WEIGHTS_URL in the reference) to
this layout; the file must be supplied locally (zero-egress environment).
BatchNorm is folded as inference-only affine statistics.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """Conv (no bias) + inference BatchNorm(eps=1e-3) + ReLU
    (torchvision BasicConv2d)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _avgpool3(x, *, fid: bool = True):
    """3x3 stride-1 avg pool, pad 1; FID variant excludes padding from the
    divisor (count_include_pad=False, ref inception.py:216-233)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=not fid)


def _maxpool3(x, stride: int, pad: int = 0):
    return nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


class MixedA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class MixedB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3(x, 2)], axis=-1)


class MixedC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = ConvBN(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class MixedD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3(x, 2)], axis=-1)


class MixedE(nn.Module):
    pool: str  # "avg_fid" (E_1) | "max" (E_2); ref inception.py:264-328

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            bp = _maxpool3(x, 1, pad=1)
        else:
            bp = _avgpool3(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Input NHWC; returns (pool3 features (B, 2048), logits (B, 1008)).

    `resize_input` bilinearly resizes to 299x299; `normalize_input` maps
    [0,1] -> [-1,1] (ref inception.py:129-163)."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            b = x.shape[0]
            x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3(x, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3(x, 2)
        x = MixedA(32, name="Mixed_5b")(x)
        x = MixedA(64, name="Mixed_5c")(x)
        x = MixedA(64, name="Mixed_5d")(x)
        x = MixedB(name="Mixed_6a")(x)
        x = MixedC(128, name="Mixed_6b")(x)
        x = MixedC(160, name="Mixed_6c")(x)
        x = MixedC(160, name="Mixed_6d")(x)
        x = MixedC(192, name="Mixed_6e")(x)
        x = MixedD(name="Mixed_7a")(x)
        x = MixedE("avg_fid", name="Mixed_7b")(x)
        x = MixedE("max", name="Mixed_7c")(x)
        feats = x.mean(axis=(1, 2))  # adaptive avg pool to 1x1
        logits = nn.Dense(1008, name="fc")(feats)
        return feats, logits


def convert_fid_inception(state_dict) -> dict:
    """pt_inception-2015-12-05 torch state dict -> FIDInceptionV3 params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    tree: dict = {}

    def put(path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "fc":
            put(["fc", "kernel" if parts[1] == "weight" else "bias"],
                v.transpose(1, 0) if parts[1] == "weight" else v)
            continue
        if parts[0] == "AuxLogits":  # not used for FID features/logits
            continue
        *mods, unit, leaf = parts  # e.g. Mixed_5b branch1x1 conv weight
        if unit == "conv":
            assert leaf == "weight"
            put(mods + ["conv", "kernel"], v.transpose(2, 3, 1, 0))
        elif unit == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}.get(leaf)
            if name is None:  # num_batches_tracked
                continue
            put(mods + [name], v)
        else:
            raise ValueError(f"unexpected key {k}")
    return {"params": tree}


def random_feature_params(rng_or_seed=0, *, input_hw: int = 16) -> dict:
    """Random-weight FIDInceptionV3 params for HERMETIC pipeline validation
    (zero-egress images have no pt_inception checkpoint; resulting FIDs are
    pipeline statistics, not comparable to published numbers).

    Flax's default init leaves the folded BatchNorm at identity
    (mean 0 / var 1 / scale 1 / bias 0); through 94 stacked conv+BN+ReLU
    layers that collapses features to a near-constant (measured: cross-batch
    feature std ~5e-5, FID scale ~1e-7). Randomizing every BN statistic and
    re-drawing fan-in-scaled conv kernels keeps features discriminative
    (measured: blob-vs-noise FID ratio 175x vs 57x at a 1000x larger
    absolute scale)."""
    import jax.random as jr

    seed = rng_or_seed if isinstance(rng_or_seed, int) else 0
    model = FIDInceptionV3()
    params = jax.jit(model.init)(
        jr.key(seed + 1), jnp.zeros((1, input_hw, input_hw, 3)))
    rng = np.random.default_rng(seed)

    def rnd(path, leaf):
        name = getattr(path[-1], "key", "")
        a = np.asarray(leaf)
        if name == "bn_var":
            return jnp.asarray(rng.uniform(0.3, 1.7, a.shape), jnp.float32)
        if name == "bn_scale":
            return jnp.asarray(rng.normal(1.0, 0.2, a.shape), jnp.float32)
        if name in ("bn_mean", "bn_bias", "bias"):
            return jnp.asarray(rng.normal(0.0, 0.2, a.shape), jnp.float32)
        fan_in = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
        return jnp.asarray(
            rng.normal(0.0, 1.0 / np.sqrt(fan_in), a.shape), jnp.float32)

    return {"params": jax.tree_util.tree_map_with_path(rnd, params["params"])}


def make_feature_fn(params, *, resize_input: bool = True,
                    normalize_input: bool = True, jit: bool = True):
    """Returns `fn(images NHWC in [0,1]) -> (features, logits)`, the
    extractor the FID/IS pipeline maps over sample batches."""
    model = FIDInceptionV3(resize_input=resize_input,
                           normalize_input=normalize_input)
    fn = lambda x: model.apply(params, x)
    return jax.jit(fn) if jit else fn
