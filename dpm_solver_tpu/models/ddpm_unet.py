"""DDPM UNet (Ho et al. 2020 CIFAR architecture) in Flax, NHWC, TPU-first.

Behavioral twin of the reference PyTorch model
(examples/ddpm_and_guided-diffusion/models/diffusion.py:6-341): same
sinusoidal time embedding, GroupNorm(32, eps=1e-6) + swish ResnetBlocks with
time-embedding injection, single-head attention at the configured
resolutions, asymmetric-padded stride-2 downsampling, nearest-neighbor 2x
upsampling, and the same skip-connection pop order — so converted reference
checkpoints reproduce outputs to fp32 round-off.

TPU-first choices: NHWC layout (native conv layout on TPU), attention as
batched einsum over (HW) tokens, optional bfloat16 activations with fp32
params (`compute_dtype`), everything shape-static for XLA.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpm_solver_tpu.ops.conv3x3 import Conv3x3


@dataclasses.dataclass(frozen=True)
class DDPMUNetConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    in_channels: int = 3
    resolution: int = 32
    resamp_with_conv: bool = True
    # conditional=False drops the time embedding entirely (NCSNv2
    # "technique 3"; ref score_sde_jax/models/ddpm.py:60-67 `if conditional`
    # and configs/vp/ddpm/cifar10_unconditional.py model.conditional=False)
    conditional: bool = True

    @staticmethod
    def cifar10() -> "DDPMUNetConfig":
        return DDPMUNetConfig()

    @staticmethod
    def celeba() -> "DDPMUNetConfig":
        """configs/celeba.yml model section (DDPM 64x64)."""
        return DDPMUNetConfig(ch_mult=(1, 2, 2, 2, 4), resolution=64)

    @staticmethod
    def lsun256() -> "DDPMUNetConfig":
        """LSUN/CelebAHQ 256px DDPM (score_sde configs/vp/ddpm/
        {church,bedroom,celebahq}.py: ch_mult (1,1,2,2,4,4))."""
        return DDPMUNetConfig(ch_mult=(1, 1, 2, 2, 4, 4), resolution=256)

    @staticmethod
    def tiny(resolution: int = 16) -> "DDPMUNetConfig":
        """Small config for tests."""
        return DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(8,), dropout=0.0,
                              resolution=resolution)


def timestep_embedding(t, dim: int):
    """Sinusoidal embedding, fairseq/tensor2tensor convention: [sin | cos]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) / (half - 1) * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6); stats in fp32 regardless of activation dtype."""

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return h.astype(x.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, *, deterministic=True):
        in_ch = x.shape[-1]
        conv = lambda name: Conv3x3(self.out_channels,
                                    dtype=self.compute_dtype, name=name)
        h = swish(GroupNorm32(name="norm1")(x))
        h = conv("conv1")(h)
        if temb is not None:  # unconditional nets pass None (ref ddpm.py:78)
            h = h + nn.Dense(self.out_channels, dtype=self.compute_dtype,
                             name="temb_proj")(swish(temb))[:, None, None, :]
        h = swish(GroupNorm32(name="norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv("conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.compute_dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over HW tokens (ref AttnBlock semantics)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm32(name="norm")(x)
        nin = lambda name: nn.Conv(c, (1, 1), dtype=self.compute_dtype, name=name)
        q = nin("q")(h).reshape(b, hh * ww, c)
        k = nin("k")(h).reshape(b, hh * ww, c)
        v = nin("v")(h).reshape(b, hh * ww, c)
        # shared attention op (dispatch picks XLA at these 256-token
        # shapes — measured faster than Pallas; fp32 softmax either way)
        from dpm_solver_tpu.ops.attention import token_attention

        h = token_attention(q, k, v, num_heads=1,
                            scale=c ** -0.5).reshape(b, hh, ww, c)
        return x + nin("proj_out")(h)


class Downsample(nn.Module):
    with_conv: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # asymmetric (0,1) pad on H and W, then VALID stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                           dtype=self.compute_dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    with_conv: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        if self.with_conv:
            x = Conv3x3(c, dtype=self.compute_dtype, name="conv")(x)
        return x


class DDPMUNet(nn.Module):
    """eps-prediction UNet; input x NHWC, t of shape (B,) (continuous labels ok)."""

    config: DDPMUNetConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        cfg = self.config
        dt = self.compute_dtype
        num_res = len(cfg.ch_mult)
        temb_ch = cfg.ch * 4

        if cfg.conditional:
            temb = timestep_embedding(t, cfg.ch)
            temb = nn.Dense(temb_ch, dtype=dt, name="temb_dense0")(temb)
            temb = nn.Dense(temb_ch, dtype=dt, name="temb_dense1")(swish(temb))
        else:  # time-unconditional net (ref score_sde_jax/models/ddpm.py:71)
            temb = None

        x = x.astype(dt)
        hs = [nn.Conv(cfg.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(x)]
        curr_res = cfg.resolution
        for i_level in range(num_res):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * cfg.ch_mult[i_level], cfg.dropout, dt,
                                name=f"down_{i_level}_block_{i_block}")(
                    hs[-1], temb, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(dt, name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(Downsample(cfg.resamp_with_conv, dt,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        mid_ch = cfg.ch * cfg.ch_mult[-1]
        h = ResnetBlock(mid_ch, cfg.dropout, dt, name="mid_block_1")(
            h, temb, deterministic=deterministic)
        h = AttnBlock(dt, name="mid_attn_1")(h)
        h = ResnetBlock(mid_ch, cfg.dropout, dt, name="mid_block_2")(
            h, temb, deterministic=deterministic)

        for i_level in reversed(range(num_res)):
            for i_block in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResnetBlock(cfg.ch * cfg.ch_mult[i_level], cfg.dropout, dt,
                                name=f"up_{i_level}_block_{i_block}")(
                    h, temb, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(dt, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv, dt,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        assert not hs

        h = swish(GroupNorm32(name="norm_out")(h))
        h = nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=dt, name="conv_out")(h)
        return h.astype(jnp.float32)
