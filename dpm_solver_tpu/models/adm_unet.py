"""ADM / guided-diffusion UNet family in Flax, NHWC, TPU-first.

Behavioral twin of the reference guided-diffusion architecture
(examples/ddpm_and_guided-diffusion/models/guided_diffusion/unet.py:81-894)
and, as the flag-subset (legacy attention order, no resblock up/down, heads
by count), of the improved-DDPM variant
(models/improved_ddpm/unet.py:50-545). Covers:

  * `ADMUNet`      — UNetModel: scale-shift GroupNorm conditioning, multi-head
                     QKV attention in both channel orders (legacy: heads
                     before qkv split; new: qkv before heads), residual
                     up/down blocks, class embedding (unet.py:396-663).
  * `super_res_inputs` — SuperResModel's low-res conditioning (unet.py:666-680).
  * `ADMClassifier` — EncoderUNetModel with all four pool heads, incl. the
                     CLIP-style AttentionPool2d (unet.py:22-51,683-894).

TPU-first: NHWC layout, attention as batched token einsums on the MXU with
fp32 softmax, `remat` instead of torch's custom checkpoint Function, bf16
compute dtype supported with fp32 GroupNorm statistics (matching the
reference's fp16 master-param discipline, nn.py:17-19).

The module tree mirrors the torch module paths (`input_blocks_4_1`, ...) so
checkpoint conversion (utils/convert.py::convert_adm_unet) is a mechanical
rename driven by the same `layout()` walk.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpm_solver_tpu.ops.conv3x3 import Conv3x3


@dataclasses.dataclass(frozen=True)
class ADMConfig:
    """Mirrors UNetModel.__init__ (unet.py:427-448). `attention_resolutions`
    holds DOWNSAMPLE RATES (ds), as in the reference module (the runner maps
    pixel resolutions to rates: runners/diffusion.py:270-276)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 8)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)  # 512-model uses 0.5 first
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    # SD / latent-diffusion extension (openaimodel.py:443-468):
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    use_linear_in_transformer: bool = False  # SD-2.x variant
    legacy: bool = True
    # Gradient checkpointing for training (the reference's
    # use_checkpoint flag, unet.py:427-448 / openaimodel.py:443-468):
    # res blocks and spatial transformers recompute in the backward
    remat: bool = False
    # Serving-time int8 path (ops/quant.py): "w8a8" quantizes the
    # transformer stack, "w8a8_conv" additionally the 3x3 conv trunk;
    # param tree and checkpoints are unaffected either way.
    quant: Optional[str] = None
    # EncoderUNetModel only:
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2

    @staticmethod
    def imagenet256_guided() -> "ADMConfig":
        """configs/imagenet256_guided.yml model section (ADM 256x256 cond)."""
        return ADMConfig(
            image_size=256, model_channels=256, out_channels=6,
            num_res_blocks=2, attention_resolutions=(8, 16, 32),
            channel_mult=(1, 1, 2, 2, 4, 4), num_classes=1000,
            num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True, use_new_attention_order=False,
        )

    @staticmethod
    def sd_v1() -> "ADMConfig":
        """Stable Diffusion v1 UNet (configs/stable-diffusion/v1-inference.yaml):
        4-ch latents at 64x64, cross-attention on 768-d CLIP context."""
        return ADMConfig(
            image_size=64, in_channels=4, model_channels=320, out_channels=4,
            num_res_blocks=2, attention_resolutions=(1, 2, 4),
            channel_mult=(1, 2, 4, 4), num_heads=8,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=768,
        )

    @staticmethod
    def sd_v2_1() -> "ADMConfig":
        """Stable Diffusion 2.1 UNet (the BASELINE throughput target):
        1024-d OpenCLIP context, 64-ch attention heads, linear transformer
        projections, v-prediction (handled by model_wrapper model_type='v')."""
        return ADMConfig(
            image_size=96, in_channels=4, model_channels=320, out_channels=4,
            num_res_blocks=2, attention_resolutions=(1, 2, 4),
            channel_mult=(1, 2, 4, 4), num_heads=-1, num_head_channels=64,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=1024, use_linear_in_transformer=True, legacy=False,
        )

    @staticmethod
    def cin256() -> "ADMConfig":
        """Class-conditional ImageNet LDM UNet
        (configs/latent-diffusion/cin256-v2.yaml): 3-ch VQ latents at 64x64,
        cross-attention on the 512-d ClassEmbedder context."""
        return ADMConfig(
            image_size=64, in_channels=3, model_channels=192, out_channels=3,
            num_res_blocks=2, attention_resolutions=(2, 4, 8),
            channel_mult=(1, 2, 3, 5), num_heads=1,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=512,
        )

    @staticmethod
    def rdm_768() -> "ADMConfig":
        """Retrieval-augmented diffusion UNet
        (configs/retrieval-augmented-diffusion/768x768.yaml): 16-ch latents
        at 48x48, cross-attention on 768-d CLIP joint-space context."""
        return ADMConfig(
            image_size=48, in_channels=16, model_channels=448,
            out_channels=16, num_res_blocks=2, attention_resolutions=(1, 2, 4),
            channel_mult=(1, 2, 3, 4), num_head_channels=32,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=768,
        )

    @staticmethod
    def imagenet64_iddpm() -> "ADMConfig":
        """configs/imagenet64.yml (improved-DDPM cosine, learned sigma)."""
        return ADMConfig(
            image_size=64, model_channels=128, out_channels=6,
            num_res_blocks=3, attention_resolutions=(4, 8),
            channel_mult=(1, 2, 3, 4), num_heads=4,
        )

    @staticmethod
    def imagenet128_guided() -> "ADMConfig":
        """configs/imagenet128_guided.yml model section (ADM 128x128 cond)."""
        return ADMConfig(
            image_size=128, model_channels=256, out_channels=6,
            num_res_blocks=2, attention_resolutions=(4, 8, 16),
            channel_mult=(1, 1, 2, 3, 4), num_classes=1000, num_heads=4,
            use_scale_shift_norm=True, resblock_updown=True,
        )

    @staticmethod
    def imagenet512_guided() -> "ADMConfig":
        """configs/imagenet512_guided.yml model section (ADM 512x512 cond;
        note the fractional first channel mult)."""
        return ADMConfig(
            image_size=512, model_channels=256, out_channels=6,
            num_res_blocks=2, attention_resolutions=(16, 32, 64),
            channel_mult=(0.5, 1, 1, 2, 2, 4, 4), num_classes=1000,
            num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )

    @staticmethod
    def lsun_bedroom_guided() -> "ADMConfig":
        """configs/bedroom_guided.yml model section (unconditional ADM 256)."""
        return ADMConfig(
            image_size=256, model_channels=256, out_channels=6,
            num_res_blocks=2, attention_resolutions=(8, 16, 32), dropout=0.1,
            channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
            num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )

    @staticmethod
    def tiny(**overrides) -> "ADMConfig":
        base = dict(image_size=16, model_channels=32, num_res_blocks=1,
                    attention_resolutions=(2, 4), channel_mult=(1, 2, 4),
                    num_heads=2)
        base.update(overrides)
        return ADMConfig(**base)


def adm_timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """OpenAI convention: [cos | sin], freqs = exp(-ln(P) * i / half)
    (guided_diffusion/nn.py:103-121 — note cos FIRST, unlike DDPM)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) / half
                    * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32, C) with fp32 statistics, torch-default eps=1e-5
    (guided_diffusion/nn.py:17-19,93-100)."""

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return h.astype(x.dtype)


def _zero_init():
    return jax.nn.initializers.zeros


def _nearest_x2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


def _avgpool_x2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ADMResample(nn.Module):
    """Upsample/Downsample with optional conv (unet.py:81-140). Torch pads
    the stride-2 conv symmetrically (padding=1), unlike TF/flax 'SAME'."""

    direction: str  # "up" | "down"
    out_ch: Optional[int] = None
    with_conv: bool = True
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch or x.shape[-1]
        if self.direction == "up":
            x = _nearest_x2(x)
            if self.with_conv:
                x = Conv3x3(out_ch, dtype=self.dtype, quant=self.quant,
                            name="conv")(x)
        elif self.with_conv:
            x = nn.Conv(out_ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="conv")(x)
        else:
            x = _avgpool_x2(x)
        return x


class ADMResBlock(nn.Module):
    """ResBlock with optional FiLM (scale-shift) conditioning and in-block
    up/downsampling (unet.py:143-256)."""

    out_ch: Optional[int] = None
    use_scale_shift_norm: bool = False
    direction: Optional[str] = None  # None | "up" | "down"
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb, *, deterministic=True):
        c = x.shape[-1]
        out_ch = self.out_ch or c
        h = jax.nn.silu(GroupNorm32(name="in_norm")(x))
        if self.direction is not None:
            resample = _nearest_x2 if self.direction == "up" else _avgpool_x2
            h = resample(h)
            x = resample(x)
        h = Conv3x3(out_ch, dtype=self.dtype, quant=self.quant,
                    name="in_conv")(h)
        emb_width = 2 * out_ch if self.use_scale_shift_norm else out_ch
        e = nn.Dense(emb_width, dtype=self.dtype, name="emb_proj")(
            jax.nn.silu(emb))[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1.0 + scale) + shift
        else:
            h = GroupNorm32(name="out_norm")(h + e)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv3x3(out_ch, kernel_init=_zero_init(), dtype=self.dtype,
                    quant=self.quant, name="out_conv")(h)
        # unlike the BigGAN block, ADM keeps an identity skip whenever the
        # channel count is unchanged — even for up/down blocks (unet.py:215-222)
        if c != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, quant=self.quant,
                            name="skip")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class _HeadPlanner:
    """Replays the reference's per-site head arithmetic, including the fact
    that `num_heads` is a *mutable local* in the torch constructor: once
    num_head_channels is set it is overwritten at every attention site and
    the new value leaks into later SpatialTransformer sites
    (openaimodel.py:543-553,589-596,644-651; guided unet.py:277-283)."""

    def __init__(self, cfg: ADMConfig):
        self.cfg = cfg
        self.num_heads = cfg.num_heads
        self.heads_up = (cfg.num_heads_upsample
                         if cfg.num_heads_upsample != -1 else cfg.num_heads)

    def spec(self, ch: int, upsample: bool = False) -> dict:
        cfg = self.cfg
        if cfg.num_head_channels == -1:
            dim_head = ch // self.num_heads
        else:
            self.num_heads = ch // cfg.num_head_channels
            dim_head = cfg.num_head_channels
        if cfg.legacy:
            dim_head = (ch // self.num_heads if cfg.use_spatial_transformer
                        else cfg.num_head_channels)
        if cfg.use_spatial_transformer:
            return dict(kind="xattn", heads=self.num_heads, dim_head=dim_head,
                        depth=cfg.transformer_depth,
                        linear=cfg.use_linear_in_transformer)
        site_heads = self.heads_up if upsample else self.num_heads
        eff = ch // dim_head if dim_head != -1 else site_heads
        return dict(kind="attn", heads=eff)


def qkv_attention(qkv, num_heads: int, *, new_order: bool):
    """Multi-head attention over tokens from a fused (B,T,3C) projection.

    `new_order=False` (legacy, QKVAttentionLegacy unet.py:328-354): the 3C
    channels are head-major [h0:(q k v), h1:(q k v), ...].
    `new_order=True` (QKVAttention unet.py:361-389): qkv-major
    [q all-heads, k all-heads, v all-heads].
    Softmax in fp32; the reference's sqrt-sqrt scaling is applied to q and k
    symmetrically for fp16/bf16 stability.
    """
    from dpm_solver_tpu.ops.attention import token_attention

    b, t, w = qkv.shape
    c = w // 3
    ch = c // num_heads
    if new_order:
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        grouped = qkv.reshape(b, t, num_heads, 3 * ch)
        parts = jnp.split(grouped, 3, axis=-1)
        q, k, v = (u.reshape(b, t, c) for u in parts)
    # the reference scales q and k by ch^-1/4 each for fp16 stability
    # (unet.py:348,381); our kernel computes logits in fp32, so the single
    # ch^-1/2 scale is equivalent and stable
    return token_attention(q, k, v, num_heads=num_heads,
                           scale=1.0 / math.sqrt(ch))


class ADMAttention(nn.Module):
    """Spatial self-attention block (unet.py:259-305)."""

    num_heads: int = 1
    new_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        tokens = GroupNorm32(name="norm")(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        h = qkv_attention(qkv, self.num_heads, new_order=self.new_order)
        h = nn.Dense(c, kernel_init=_zero_init(), dtype=self.dtype,
                     name="proj_out")(h)
        return x + h.reshape(b, hh, ww, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling with a mean-token query
    (unet.py:22-51); used by the ImageNet classifiers."""

    num_head_channels: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        tokens = x.reshape(b, hh * ww, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            jax.nn.initializers.normal(stddev=1.0 / math.sqrt(c)),
            (hh * ww + 1, c))
        tokens = tokens + pos[None].astype(tokens.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tokens)
        h = qkv_attention(qkv, c // self.num_head_channels, new_order=True)
        h = nn.Dense(self.out_ch, dtype=self.dtype, name="c_proj")(h)
        return h[:, 0]


# --------------------------------------------------------------------------- #
# structural layout shared by the model, the classifier, and the converter
# --------------------------------------------------------------------------- #


def layout(cfg: ADMConfig, encoder_only: bool = False) -> Dict[str, Any]:
    """Replay of the reference constructor loops (unet.py:480-616) producing,
    per torch module index, the layer specs inside each TimestepEmbedSequential.
    Spec kinds: conv_in | res | attn | resample."""

    mc = cfg.model_channels
    heads = _HeadPlanner(cfg)
    ch = int(cfg.channel_mult[0] * mc)
    input_blocks: List[List[dict]] = [[dict(kind="conv_in", out_ch=ch)]]
    chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [dict(kind="res", out_ch=int(mult * mc))]
            ch = int(mult * mc)
            if ds in cfg.attention_resolutions:
                layers.append(heads.spec(ch))
            input_blocks.append(layers)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append(
                    [dict(kind="res", out_ch=ch, direction="down")])
            else:
                input_blocks.append(
                    [dict(kind="resample", direction="down", out_ch=ch,
                          with_conv=cfg.conv_resample)])
            chans.append(ch)
            ds *= 2

    middle = [dict(kind="res", out_ch=ch),
              heads.spec(ch),
              dict(kind="res", out_ch=ch)]

    output_blocks: List[List[dict]] = []
    if not encoder_only:
        skip = list(chans)
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                skip.pop()
                layers = [dict(kind="res", out_ch=int(mult * mc))]
                ch = int(mult * mc)
                if ds in cfg.attention_resolutions:
                    layers.append(heads.spec(ch, upsample=True))
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        layers.append(dict(kind="res", out_ch=ch,
                                           direction="up"))
                    else:
                        layers.append(dict(kind="resample", direction="up",
                                           out_ch=ch,
                                           with_conv=cfg.conv_resample))
                    ds //= 2
                output_blocks.append(layers)
    return dict(input_blocks=input_blocks, middle=middle,
                output_blocks=output_blocks)


class _ADMBase(nn.Module):
    """Shared encoder machinery for ADMUNet and ADMClassifier."""

    config: ADMConfig
    compute_dtype: Any = jnp.float32

    def _layer(self, name: str, spec: dict, h, emb, deterministic,
               context=None):
        cfg = self.config
        dt = self.compute_dtype
        kind = spec["kind"]
        if kind == "conv_in":
            return nn.Conv(spec["out_ch"], (3, 3), padding=((1, 1), (1, 1)),
                           dtype=dt, name=name)(h)
        if kind == "res":
            mod = ADMResBlock(
                out_ch=spec["out_ch"], direction=spec.get("direction"),
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                dropout=cfg.dropout, dtype=dt, quant=cfg.quant, name=name)
            if cfg.remat:
                # lifted jax.checkpoint (the reference's use_checkpoint,
                # unet.py:198); `deterministic` closes over statically
                return nn.remat(
                    lambda m, hh, ee: m(hh, ee,
                                        deterministic=deterministic)
                )(mod, h, emb)
            return mod(h, emb, deterministic=deterministic)
        if kind == "attn":
            return ADMAttention(num_heads=spec["heads"],
                                new_order=cfg.use_new_attention_order,
                                dtype=dt, name=name)(h)
        if kind == "xattn":
            from dpm_solver_tpu.models.transformer import SpatialTransformer

            mod = SpatialTransformer(
                heads=spec["heads"], dim_head=spec["dim_head"],
                depth=spec["depth"], linear_proj=spec.get("linear", False),
                dtype=dt, quant=cfg.quant, name=name)
            if cfg.remat:
                return nn.remat(
                    lambda m, hh, ctx: m(hh, context=ctx))(mod, h, context)
            return mod(h, context=context)
        if kind == "resample":
            return ADMResample(direction=spec["direction"],
                               out_ch=spec["out_ch"],
                               with_conv=spec["with_conv"], dtype=dt,
                               quant=cfg.quant, name=name)(h)
        raise ValueError(kind)

    def _embed(self, t):
        cfg = self.config
        dt = self.compute_dtype
        emb = adm_timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt,
                       name="time_embed_0")(emb)
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt,
                       name="time_embed_2")(jax.nn.silu(emb))
        return emb


class ADMUNet(_ADMBase):
    """UNetModel (unet.py:396-663). x NHWC; t (B,) discrete labels; y (B,)
    int class labels iff config.num_classes is set."""

    @nn.compact
    def __call__(self, x, t, y=None, context=None, *, deterministic=True):
        cfg = self.config
        assert (y is not None) == (cfg.num_classes is not None)
        plan = layout(cfg)
        emb = self._embed(t)
        if cfg.num_classes is not None:
            emb = emb + nn.Embed(cfg.num_classes, cfg.model_channels * 4,
                                 dtype=self.compute_dtype, name="label_emb")(y)

        h = x.astype(self.compute_dtype)
        hs = []
        for n, layers in enumerate(plan["input_blocks"]):
            for m, spec in enumerate(layers):
                h = self._layer(f"input_blocks_{n}_{m}", spec, h, emb,
                                deterministic, context)
            hs.append(h)
        for m, spec in enumerate(plan["middle"]):
            h = self._layer(f"middle_block_{m}", spec, h, emb, deterministic,
                            context)
        for n, layers in enumerate(plan["output_blocks"]):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for m, spec in enumerate(layers):
                h = self._layer(f"output_blocks_{n}_{m}", spec, h, emb,
                                deterministic, context)
        h = jax.nn.silu(GroupNorm32(name="out_norm")(h.astype(x.dtype)))
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=_zero_init(), dtype=self.compute_dtype,
                       name="out_conv")(h).astype(jnp.float32)


def super_res_inputs(x, low_res):
    """SuperResModel conditioning (unet.py:666-680): bilinear-upsample the
    low-res image to x's resolution and concatenate on channels."""
    b, h, w, _ = x.shape
    up = jax.image.resize(low_res, (b, h, w, low_res.shape[-1]), "bilinear")
    return jnp.concatenate([x, up], axis=-1)


class ADMClassifier(_ADMBase):
    """EncoderUNetModel (unet.py:683-894): half-UNet + pooling head.
    Returns (B, out_channels) logits."""

    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        cfg = self.config
        plan = layout(cfg, encoder_only=True)
        emb = self._embed(t)
        h = x.astype(self.compute_dtype)
        spatial = []
        for n, layers in enumerate(plan["input_blocks"]):
            for m, spec in enumerate(layers):
                h = self._layer(f"input_blocks_{n}_{m}", spec, h, emb,
                                deterministic)
            if cfg.pool.startswith("spatial"):
                spatial.append(h.mean(axis=(1, 2)))
        for m, spec in enumerate(plan["middle"]):
            h = self._layer(f"middle_block_{m}", spec, h, emb, deterministic)

        if cfg.pool == "adaptive":
            h = jax.nn.silu(GroupNorm32(name="out_norm")(h))
            h = h.mean(axis=(1, 2), keepdims=True)
            h = nn.Conv(cfg.out_channels, (1, 1), kernel_init=_zero_init(),
                        dtype=self.compute_dtype, name="out_conv")(h)
            return h.reshape(h.shape[0], -1)
        if cfg.pool == "attention":
            assert cfg.num_head_channels != -1
            h = jax.nn.silu(GroupNorm32(name="out_norm")(h))
            return AttentionPool2d(num_head_channels=cfg.num_head_channels,
                                   out_ch=cfg.out_channels,
                                   dtype=self.compute_dtype,
                                   name="out_pool")(h)
        spatial.append(h.mean(axis=(1, 2)))
        h = jnp.concatenate(spatial, axis=-1)
        if cfg.pool == "spatial":
            h = nn.Dense(2048, dtype=self.compute_dtype, name="out_fc0")(h)
            h = jax.nn.relu(h)
            return nn.Dense(cfg.out_channels, dtype=self.compute_dtype,
                            name="out_fc1")(h)
        if cfg.pool == "spatial_v2":
            h = nn.Dense(2048, dtype=self.compute_dtype, name="out_fc0")(h)
            h = jax.nn.silu(GroupNorm32(name="out_norm")(h))
            return nn.Dense(cfg.out_channels, dtype=self.compute_dtype,
                            name="out_fc1")(h)
        raise ValueError(f"unknown pool {cfg.pool!r}")
