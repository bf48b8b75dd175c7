"""NCSN++ / DDPM++ score network (Song et al. 2021) in Flax, NHWC, TPU-first.

Behavioral twin of the reference implementation
(examples/score_sde_jax/models/{ncsnpp.py:36-243, layerspp.py, layers.py,
up_or_down_sampling.py} and its torch mirror with the CUDA upfirdn2d op),
re-designed for TPU:

  * NHWC end to end (native TPU conv layout; the torch reference is NCHW).
  * FIR resampling through `dpm_solver_tpu.ops.resample` — one dilated
    depthwise XLA conv instead of the reference's CUDA kernel / 6-step
    jnp composition.
  * Attention as ONE fused QKV projection (a single (C,3C) matmul feeding
    the MXU) over flattened HW tokens, instead of three separate NIN
    einsums + a 5-D `bhwHW` attention tensor.
  * A single `ResBlockpp` covering both reference variants
    (ResnetBlockDDPMpp / ResnetBlockBigGANpp, layerspp.py:146-227) and the
    in-block up/down resampling, so the network body is one module type.
  * Explicit, stable parameter names (the reference relies on flax
    auto-numbering, which breaks the moment the call order changes).

`params_from_reference` converts a reference score_sde_jax parameter tree
(as produced by the published flax checkpoints) into this layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.models.ddpm_unet import timestep_embedding
from dpm_solver_tpu.ops import resample as rs
from dpm_solver_tpu.ops.conv3x3 import Conv3x3


@dataclasses.dataclass(frozen=True)
class NCSNppConfig:
    """Static architecture hyperparameters (ref config tree, e.g.
    configs/vp/cifar10_ddpmpp_deep_continuous.py:60-82)."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 8
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    skip_rescale: bool = True
    resblock_type: str = "biggan"  # "biggan" | "ddpm"
    progressive: str = "none"  # none | output_skip | residual
    progressive_input: str = "none"  # none | input_skip | residual
    progressive_combine: str = "sum"  # sum | cat
    embedding_type: str = "positional"  # positional | fourier
    fourier_scale: float = 16.0
    init_scale: float = 0.0
    nonlinearity: str = "swish"
    scale_by_sigma: bool = False
    data_centered: bool = True
    image_size: int = 32
    image_channels: int = 3
    # sigma ladder for discrete-VE positional nets (ref mutils.get_sigmas);
    # the fourier path receives sigmas directly and ignores these
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000
    # rematerialize each resblock in the backward pass. The train step is
    # HBM-bound (results_roofline_train_guided_v5e.json: 62 ms bytes floor
    # vs 40 ms MXU at batch 128), so trading saved-activation traffic for
    # recompute on the idle MXU is the right direction; replaces torch's
    # utils.checkpoint in the reference ADM trunk (unet.py:"use_checkpoint")
    remat: bool = False

    def __post_init__(self):
        assert self.resblock_type in ("biggan", "ddpm")
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.progressive_combine in ("sum", "cat")
        assert self.embedding_type in ("positional", "fourier")

    # -- canonical instances (ref configs/{vp,ve}/cifar10_*.py) ------------
    @staticmethod
    def cifar10_ddpmpp(deep: bool = False) -> "NCSNppConfig":
        """VP DDPM++ (cont.): configs/vp/cifar10_ddpmpp{_deep}_continuous.py."""
        return NCSNppConfig(num_res_blocks=8 if deep else 4)

    @staticmethod
    def cifar10_ncsnpp(deep: bool = False) -> "NCSNppConfig":
        """VE NCSN++ (cont.): configs/ve/cifar10_ncsnpp{_deep}_continuous.py."""
        return NCSNppConfig(
            num_res_blocks=8 if deep else 4,
            fir=True,
            progressive_input="residual",
            embedding_type="fourier",
            scale_by_sigma=True,
            data_centered=False,
        )

    @staticmethod
    def cifar10_ncsnpp_vp(deep: bool = False) -> "NCSNppConfig":
        """VP/subVP NCSN++: configs/{vp,subvp}/cifar10_ncsnpp*_continuous.py
        (FIR + residual input pyramid, positional embedding, no σ-scaling)."""
        return NCSNppConfig(num_res_blocks=8 if deep else 4, fir=True,
                            progressive_input="residual")

    @staticmethod
    def celeba64() -> "NCSNppConfig":
        """VE NCSN++ @64px: configs/ve/celeba_ncsnpp.py (positional
        embedding, discrete sigma ladder)."""
        return NCSNppConfig(num_res_blocks=4, fir=True,
                            progressive_input="residual",
                            scale_by_sigma=True, data_centered=False,
                            image_size=64, sigma_max=90.0, num_scales=1000)

    @staticmethod
    def px256() -> "NCSNppConfig":
        """VE NCSN++ @256px: configs/ve/{celebahq_256,ffhq_256,church,
        bedroom}_ncsnpp_continuous.py (7-level pyramid, output_skip +
        input_skip progressive, Fourier embedding)."""
        return NCSNppConfig(
            ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, dropout=0.0,
            fir=True, progressive="output_skip",
            progressive_input="input_skip", embedding_type="fourier",
            scale_by_sigma=True, data_centered=False, image_size=256)

    @staticmethod
    def px1024() -> "NCSNppConfig":
        """VE NCSN++ @1024px: configs/ve/{celebahq,ffhq}_ncsnpp_continuous.py
        (nf 16, 8-level pyramid)."""
        return NCSNppConfig(
            nf=16, ch_mult=(1, 2, 4, 8, 16, 32, 32, 32), num_res_blocks=1,
            dropout=0.0, fir=True, progressive="output_skip",
            progressive_input="input_skip", embedding_type="fourier",
            scale_by_sigma=True, data_centered=False, image_size=1024)

    @staticmethod
    def tiny(**overrides) -> "NCSNppConfig":
        base = dict(nf=32, ch_mult=(1, 2), num_res_blocks=2, dropout=0.0,
                    attn_resolutions=(8,), image_size=16)
        base.update(overrides)
        return NCSNppConfig(**base)


def ddpm_init(scale: float = 1.0):
    """variance_scaling(scale, fan_avg, uniform); scale=0 -> near-zero init
    (ref layers.py:60-63)."""
    return jax.nn.initializers.variance_scaling(
        1e-10 if scale == 0 else scale, "fan_avg", "uniform")


def get_act(name: str):
    return {
        "elu": jax.nn.elu,
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
        "swish": jax.nn.swish,
    }[name]


def _gn(c: int, name: str) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=min(c // 4, 32), epsilon=1e-6, name=name)


class FourierFeatures(nn.Module):
    """Random Fourier embedding of log-sigma; the projection matrix is a
    frozen draw (ref layerspp.py:33-43)."""

    dim: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        w = self.param("W", jax.nn.initializers.normal(stddev=self.scale),
                       (self.dim,))
        ang = 2 * jnp.pi * x[:, None] * jax.lax.stop_gradient(w)[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class SelfAttention2D(nn.Module):
    """Single-head attention over HW tokens with one fused QKV matmul
    (ref AttnBlockpp, layerspp.py:61-83, computes q/k/v separately)."""

    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(c, "norm")(x)
        qkv = nn.Dense(3 * c, kernel_init=ddpm_init(), dtype=self.dtype,
                       name="qkv")(h.reshape(b, hh * ww, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        from dpm_solver_tpu.ops.attention import token_attention

        h = token_attention(q, k, v, num_heads=1, scale=c ** -0.5)
        h = nn.Dense(c, kernel_init=ddpm_init(self.init_scale),
                     dtype=self.dtype, name="proj")(h)
        h = x.astype(h.dtype) + h.reshape(b, hh, ww, c)
        return h / math.sqrt(2.0) if self.skip_rescale else h


class Resample(nn.Module):
    """Standalone 2x up/downsample, optionally conv-fused
    (ref layerspp.py:86-143 Upsample/Downsample incl. the StyleGAN2
    Conv2d path, up_or_down_sampling.py:40-73)."""

    direction: str  # "up" | "down"
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        up = self.direction == "up"
        if not self.fir:
            if up:
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                if self.with_conv:
                    x = Conv3x3(out_ch, kernel_init=ddpm_init(),
                                dtype=self.dtype, name="conv")(x)
            elif self.with_conv:
                x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="SAME",
                            kernel_init=ddpm_init(), dtype=self.dtype,
                            name="conv")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        elif not self.with_conv:
            fn = rs.upsample_2d if up else rs.downsample_2d
            x = fn(x.astype(self.dtype), self.fir_kernel, factor=2)
        else:
            kern = self.param("kernel", ddpm_init(), (3, 3, c, out_ch))
            bias = self.param("bias", jax.nn.initializers.zeros, (out_ch,))
            fn = rs.upsample_conv_2d if up else rs.conv_downsample_2d
            x = fn(x.astype(self.dtype), kern.astype(self.dtype),
                   k=self.fir_kernel) + bias.astype(self.dtype)
        return x


class ResBlockpp(nn.Module):
    """Unified residual block: covers the reference's ResnetBlockDDPMpp and
    ResnetBlockBigGANpp (layerspp.py:146-227) incl. in-block resampling."""

    out_ch: Optional[int] = None
    variant: str = "biggan"  # "biggan" | "ddpm"
    direction: Optional[str] = None  # None | "up" | "down" (biggan only)
    act_name: str = "swish"
    dropout: float = 0.1
    skip_rescale: bool = True
    init_scale: float = 0.0
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    dtype: Any = jnp.float32

    def _resample(self, v):
        if self.direction is None:
            return v
        if self.fir:
            fn = rs.upsample_2d if self.direction == "up" else rs.downsample_2d
            return fn(v, self.fir_kernel, factor=2)
        if self.direction == "up":
            return rs.nearest_upsample_2d(v)
        return rs.mean_downsample_2d(v)

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic=True):
        act = get_act(self.act_name)
        c = x.shape[-1]
        out_ch = self.out_ch or c
        h = act(_gn(c, "norm1")(x)).astype(self.dtype)
        if self.variant == "biggan":
            h = self._resample(h)
            x = self._resample(x.astype(self.dtype))
        h = Conv3x3(out_ch, kernel_init=ddpm_init(),
                    dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=ddpm_init(),
                             dtype=self.dtype,
                             name="temb_proj")(act(temb))[:, None, None, :]
        h = act(_gn(out_ch, "norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv3x3(out_ch, kernel_init=ddpm_init(self.init_scale),
                    dtype=self.dtype, name="conv2")(h)
        if c != out_ch or self.direction is not None:
            x = nn.Conv(out_ch, (1, 1), kernel_init=ddpm_init(),
                        dtype=self.dtype, name="shortcut")(x)
        h = (x.astype(h.dtype) if x.dtype != h.dtype else x) + h
        return h / math.sqrt(2.0) if self.skip_rescale else h


class NCSNpp(nn.Module):
    """NCSN++/DDPM++ UNet; x NHWC, time_cond of shape (B,) — discrete labels
    for `positional` embedding, sigmas for `fourier` (ref ncsnpp.py:41-243)."""

    config: NCSNppConfig
    # bf16 serving: convs/matmuls in compute_dtype, GroupNorm stats and the
    # final sigma scaling in fp32 (default fp32 preserves 1e-4 parity)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_cond, *, deterministic=True):
        cfg = self.config
        dt = self.compute_dtype
        act = get_act(cfg.nonlinearity)
        levels = len(cfg.ch_mult)
        res_at = [cfg.image_size // (2 ** i) for i in range(levels)]

        def resblock(name, out_ch=None, direction=None):
            mod = ResBlockpp(
                out_ch=out_ch, variant=cfg.resblock_type, direction=direction,
                act_name=cfg.nonlinearity, dropout=cfg.dropout,
                skip_rescale=cfg.skip_rescale, init_scale=cfg.init_scale,
                fir=cfg.fir, fir_kernel=cfg.fir_kernel, dtype=dt, name=name)
            if not cfg.remat:
                return mod
            # lifted jax.checkpoint around the block: only the block
            # boundary is saved for the backward; internals recompute.
            # `det` closes over as a static Python bool (nn.Dropout needs
            # it concrete).
            def rematted(h, temb, *, deterministic=True):
                return nn.remat(
                    lambda m, hh, tt: m(hh, tt, deterministic=deterministic)
                )(mod, h, temb)
            return rematted

        def attn(name):
            return SelfAttention2D(skip_rescale=cfg.skip_rescale,
                                   init_scale=cfg.init_scale, dtype=dt,
                                   name=name)

        def pyramid_resample(name, direction, out_ch=None, with_conv=False):
            return Resample(direction=direction, out_ch=out_ch,
                            with_conv=with_conv, fir=cfg.fir,
                            fir_kernel=cfg.fir_kernel, dtype=dt, name=name)

        # ---- time / noise-level embedding --------------------------------
        if cfg.embedding_type == "fourier":
            temb = FourierFeatures(cfg.nf, cfg.fourier_scale, name="fourier")(
                jnp.log(time_cond))
            used_sigmas = time_cond
        else:
            temb = timestep_embedding(time_cond, cfg.nf)
            used_sigmas = None
            if cfg.scale_by_sigma:
                # discrete-VE nets (e.g. ve/celeba_ncsnpp.py): time_cond is
                # an int sigma index into the geometric ladder
                # (ref ncsnpp.py positional branch: sigmas[time_cond.astype])
                from dpm_solver_tpu.models.ncsnv2 import get_sigmas

                table = jnp.asarray(
                    get_sigmas(cfg.sigma_min, cfg.sigma_max, cfg.num_scales),
                    x.dtype)
                used_sigmas = table[time_cond.astype(jnp.int32)]
        if cfg.conditional:
            temb = nn.Dense(cfg.nf * 4, kernel_init=ddpm_init(), dtype=dt,
                            name="time_embed_0")(temb)
            temb = nn.Dense(cfg.nf * 4, kernel_init=ddpm_init(), dtype=dt,
                            name="time_embed_1")(act(temb))
        else:
            temb = None

        if not cfg.data_centered:
            x = 2.0 * x - 1.0

        # ---- encoder ------------------------------------------------------
        pyramid_in = x if cfg.progressive_input != "none" else None
        hs = [nn.Conv(cfg.nf, (3, 3), kernel_init=ddpm_init(), dtype=dt,
                      name="conv_in")(x)]
        for i in range(levels):
            for j in range(cfg.num_res_blocks):
                h = resblock(f"down_{i}_block_{j}", cfg.nf * cfg.ch_mult[i])(
                    hs[-1], temb, deterministic=deterministic)
                if res_at[i] in cfg.attn_resolutions:
                    h = attn(f"down_{i}_attn_{j}")(h)
                hs.append(h)
            if i == levels - 1:
                continue
            if cfg.resblock_type == "ddpm":
                h = pyramid_resample(f"down_{i}_resample", "down",
                                     with_conv=cfg.resamp_with_conv)(hs[-1])
            else:
                h = resblock(f"down_{i}_resample", direction="down")(
                    hs[-1], temb, deterministic=deterministic)
            if cfg.progressive_input == "input_skip":
                pyramid_in = pyramid_resample(f"down_{i}_pyr", "down")(pyramid_in)
                z = nn.Conv(h.shape[-1], (1, 1), kernel_init=ddpm_init(),
                            dtype=dt, name=f"down_{i}_combine")(pyramid_in)
                h = (jnp.concatenate([z, h], axis=-1)
                     if cfg.progressive_combine == "cat" else z + h)
            elif cfg.progressive_input == "residual":
                pyramid_in = pyramid_resample(
                    f"down_{i}_pyr", "down", out_ch=h.shape[-1],
                    with_conv=True)(pyramid_in)
                pyramid_in = pyramid_in + h
                if cfg.skip_rescale:
                    pyramid_in = pyramid_in / math.sqrt(2.0)
                h = pyramid_in
            hs.append(h)

        # ---- bottleneck ----------------------------------------------------
        h = hs[-1]
        h = resblock("mid_block_1")(h, temb, deterministic=deterministic)
        h = attn("mid_attn")(h)
        h = resblock("mid_block_2")(h, temb, deterministic=deterministic)

        # ---- decoder -------------------------------------------------------
        pyramid = None
        for i in reversed(range(levels)):
            for j in range(cfg.num_res_blocks + 1):
                h = resblock(f"up_{i}_block_{j}", cfg.nf * cfg.ch_mult[i])(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    deterministic=deterministic)
            if res_at[i] in cfg.attn_resolutions:
                h = attn(f"up_{i}_attn")(h)
            if cfg.progressive != "none":
                to_img = cfg.progressive == "output_skip"
                if i == levels - 1 or to_img:
                    branch = nn.Conv(
                        x.shape[-1] if to_img else h.shape[-1], (3, 3),
                        kernel_init=ddpm_init(cfg.init_scale if to_img else 1.0),
                        dtype=dt, name=f"up_{i}_pyr_conv")(
                            act(_gn(h.shape[-1], f"up_{i}_pyr_norm")(h)))
                if i == levels - 1:
                    pyramid = branch
                elif to_img:
                    pyramid = pyramid_resample(f"up_{i}_pyr_up", "up")(pyramid)
                    pyramid = pyramid + branch
                else:
                    pyramid = pyramid_resample(
                        f"up_{i}_pyr_up", "up", out_ch=h.shape[-1],
                        with_conv=True)(pyramid)
                    pyramid = pyramid + h
                    if cfg.skip_rescale:
                        pyramid = pyramid / math.sqrt(2.0)
                    h = pyramid
            if i != 0:
                if cfg.resblock_type == "ddpm":
                    h = pyramid_resample(f"up_{i}_resample", "up",
                                         with_conv=cfg.resamp_with_conv)(h)
                else:
                    h = resblock(f"up_{i}_resample", direction="up")(
                        h, temb, deterministic=deterministic)
        assert not hs

        if cfg.progressive == "output_skip":
            h = pyramid
        else:
            h = act(_gn(h.shape[-1], "norm_out")(h))
            h = nn.Conv(cfg.image_channels, (3, 3),
                        kernel_init=ddpm_init(cfg.init_scale),
                        dtype=dt, name="conv_out")(h)

        h = h.astype(jnp.float32)  # solver math downstream is fp32
        if cfg.scale_by_sigma:
            h = h / used_sigmas.reshape(-1, *([1] * (x.ndim - 1)))
        return h
