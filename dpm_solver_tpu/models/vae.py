"""AutoencoderKL (the Stable-Diffusion first stage) in Flax, NHWC, TPU-first.

Behavioral twin of the reference LDM VAE:
  * conv stacks: examples/stable-diffusion/ldm/modules/diffusionmodules/
    model.py (Upsample/Downsample :42-79, ResnetBlock :82-141, AttnBlock
    :150-207, Encoder :368-460, Decoder :462-569),
  * the KL wrapper + 1x1 quant convs: ldm/models/autoencoder.py:285-343,
  * the posterior: ldm/modules/distributions/distributions.py:24-62.

TPU-first: NHWC, the single-head mid attention runs as one fused (C,3C)
token matmul + batched einsums (the reference does three 1x1 convs and two
`torch.bmm`s in NCHW), GroupNorm statistics in fp32. `VQModel` (the VQ
first stage, ldm/models/autoencoder.py:14-282) is ported below; the
GAN/LPIPS training losses live in training/{perceptual,autoencoder}.py and
models/{lpips,discriminator}.py. Only the PyTorch-Lightning harness itself
is replaced (by the preemption-safe run_lib loops; SURVEY.md §7)."""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.ops.conv3x3 import Conv3x3
from dpm_solver_tpu.ops.conv3x3 import conv3x3 as conv3x3_op


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig + embed_dim (ref configs/stable-diffusion/v1-inference.yaml
    first_stage_config)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    embed_dim: int = 4
    dropout: float = 0.0
    resamp_with_conv: bool = True
    tanh_out: bool = False
    # Serving-time int8 conv path (ops/quant.py, mode "w8a8_conv"): res-block
    # and resample 3x3 convs run W8A8; conv_in/conv_out (pixel boundary) and
    # attention stay float. Param tree/checkpoints unchanged.
    quant: Optional[str] = None

    @staticmethod
    def sd_v1() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def vq_cin256() -> "VAEConfig":
        """f4 VQ first stage of the class-conditional ImageNet LDM
        (configs/latent-diffusion/cin256-v2.yaml: z=3, ch_mult (1,2,4),
        n_embed 8192, no attention, double_z false)."""
        return VAEConfig(ch_mult=(1, 2, 4), z_channels=3, embed_dim=3,
                         double_z=False, attn_resolutions=())

    @staticmethod
    def rdm_768() -> "VAEConfig":
        """f16/z16 KL first stage of the retrieval-augmented model
        (configs/retrieval-augmented-diffusion/768x768.yaml)."""
        return VAEConfig(ch_mult=(1, 1, 2, 2, 4), z_channels=16,
                         embed_dim=16, attn_resolutions=(16,))

    @staticmethod
    def tiny(**overrides) -> "VAEConfig":
        base = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                    z_channels=4, embed_dim=4, attn_resolutions=(16,))
        base.update(overrides)
        return VAEConfig(**base)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _norm(name: str) -> nn.GroupNorm:
    # ldm Normalize: GroupNorm(32, eps=1e-6) with fp32 statistics
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                        name=name)


class VAEResBlock(nn.Module):
    """ResnetBlock with temb_channels=0 (model.py:82-141)."""

    out_ch: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        c = x.shape[-1]
        out_ch = self.out_ch or c
        h = _swish(_norm("norm1")(x))
        h = Conv3x3(out_ch, dtype=self.dtype, quant=self.quant,
                    name="conv1")(h)
        h = _swish(_norm("norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv3x3(out_ch, dtype=self.dtype, quant=self.quant,
                    name="conv2")(h)
        if c != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial attention (model.py:150-207) with the three 1x1
    q/k/v convs fused into one (C,3C) token matmul."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        from dpm_solver_tpu.ops.attention import token_attention

        tokens = _norm("norm")(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = token_attention(q, k, v, num_heads=1, scale=c ** -0.5)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(b, hh, ww, c)


class VAEEncoder(nn.Module):
    """model.py:368-460; emits 2*z_channels moments when double_z."""

    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        cfg = self.config
        dt = self.dtype
        res = cfg.resolution
        h = Conv3x3(cfg.ch, dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = VAEResBlock(cfg.ch * mult, cfg.dropout, dt,
                                quant=cfg.quant,
                                name=f"down_{i}_block_{j}")(
                    h, deterministic=deterministic)
                if res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dt, name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                if cfg.resamp_with_conv:
                    # torch pads (0,1,0,1) manually (model.py:72-76)
                    h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    h = nn.Conv(h.shape[-1], (3, 3), strides=2,
                                padding="VALID", dtype=dt,
                                name=f"down_{i}_downsample")(h)
                else:
                    h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                res //= 2
        h = VAEResBlock(None, cfg.dropout, dt, quant=cfg.quant,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = VAEResBlock(None, cfg.dropout, dt, quant=cfg.quant,
                        name="mid_block_2")(h, deterministic=deterministic)
        h = _swish(_norm("norm_out")(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv3x3(out_ch, dtype=dt, name="conv_out")(h)


class VAEDecoder(nn.Module):
    """model.py:462-569."""

    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic=True, return_trunk=False):
        cfg = self.config
        dt = self.dtype
        levels = len(cfg.ch_mult)
        res = cfg.resolution // 2 ** (levels - 1)
        h = Conv3x3(cfg.ch * cfg.ch_mult[-1], dtype=dt, name="conv_in")(z)
        h = VAEResBlock(None, cfg.dropout, dt, quant=cfg.quant,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = VAEResBlock(None, cfg.dropout, dt, quant=cfg.quant,
                        name="mid_block_2")(h, deterministic=deterministic)
        for i in reversed(range(levels)):
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(cfg.ch * cfg.ch_mult[i], cfg.dropout, dt,
                                quant=cfg.quant,
                                name=f"up_{i}_block_{j}")(
                    h, deterministic=deterministic)
                if res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dt, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), "nearest")
                if cfg.resamp_with_conv:
                    h = Conv3x3(c, dtype=dt, quant=cfg.quant,
                                name=f"up_{i}_upsample")(h)
                res *= 2
        h = _swish(_norm("norm_out")(h))
        if return_trunk:
            # Adversarial training splits here: the caller re-applies
            # `decoder_epilogue` as a function of conv_out's params so the
            # adaptive GAN weight (contperceptual.py:32-43) costs one conv
            # backward, not a decoder backward.
            return h
        h = Conv3x3(cfg.out_ch, dtype=dt, name="conv_out")(h)
        return jnp.tanh(h) if cfg.tanh_out else h


def decoder_epilogue(conv_out_params, h, *, tanh_out=False,
                     dtype=jnp.float32):
    """Final decoder conv as a pure function of its params (see
    `VAEDecoder.__call__(return_trunk=True)`). `dtype` must match the
    decoder's compute dtype so the split path is bit-identical to
    `decode` (Conv3x3 casts activations and bias, kernel stays fp32)."""
    bias = conv_out_params.get("bias")
    out = conv3x3_op(h.astype(dtype), conv_out_params["kernel"],
                     None if bias is None else bias.astype(dtype))
    return jnp.tanh(out) if tanh_out else out


class DiagonalGaussian(NamedTuple):
    """Posterior over latents (distributions.py:24-62); moments NHWC with
    channels = 2*z (mean | logvar)."""

    mean: jax.Array
    logvar: jax.Array

    @staticmethod
    def from_moments(moments) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(
            self.mean ** 2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3))

    def nll(self, sample):
        log2pi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            log2pi + self.logvar
            + (sample - self.mean) ** 2 / jnp.exp(self.logvar),
            axis=(1, 2, 3))


class AutoencoderKL(nn.Module):
    """Encoder/Decoder + 1x1 quant convs (autoencoder.py:285-343). Methods:
    `encode(x) -> DiagonalGaussian`, `decode(z)`, `__call__` for init."""

    config: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = VAEEncoder(cfg, self.dtype, name="encoder")
        self.decoder = VAEDecoder(cfg, self.dtype, name="decoder")
        zc = cfg.z_channels
        self.quant_conv = nn.Conv(
            2 * cfg.embed_dim if cfg.double_z else cfg.embed_dim, (1, 1),
            dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(zc, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x, *, deterministic=True) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z, *, deterministic=True):
        return self.decoder(self.post_quant_conv(z),
                            deterministic=deterministic)

    def __call__(self, x, rng=None, *, sample_posterior=False,
                 deterministic=True):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior

    def forward_trunk(self, x, rng=None, *, sample_posterior=True,
                      deterministic=True):
        """Training forward split at the decoder's final conv: returns
        (pre-conv_out activations, posterior). Pair with
        `decoder_epilogue(params['decoder']['conv_out'], h)`."""
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        h = self.decoder(self.post_quant_conv(z), return_trunk=True,
                         deterministic=deterministic)
        return h, posterior


def convert_autoencoder_kl(state_dict, config: VAEConfig) -> dict:
    """LDM AutoencoderKL torch state dict -> our params. Accepts either a
    standalone VAE checkpoint or a full SD checkpoint (keys prefixed
    `first_stage_model.`). q/k/v 1x1 convs are stacked into the fused qkv."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("first_stage_model."):
            k = k[len("first_stage_model."):]
        sd[k] = np.asarray(v)
    if not any(k.startswith("encoder.") for k in sd):
        raise ValueError("no encoder.* keys found in state dict")

    def conv(src):
        return {"kernel": sd[src + ".weight"].transpose(2, 3, 1, 0),
                "bias": sd[src + ".bias"]}

    def gn(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    def dense_from_1x1(src):
        return {"kernel": sd[src + ".weight"][:, :, 0, 0].transpose(1, 0),
                "bias": sd[src + ".bias"]}

    def resblock(src):
        out = {"norm1": gn(src + ".norm1"), "conv1": conv(src + ".conv1"),
               "norm2": gn(src + ".norm2"), "conv2": conv(src + ".conv2")}
        if src + ".nin_shortcut.weight" in sd:
            out["nin_shortcut"] = conv(src + ".nin_shortcut")
        return out

    def attn(src):
        qkv_k = np.concatenate(
            [sd[f"{src}.{n}.weight"][:, :, 0, 0].transpose(1, 0)
             for n in ("q", "k", "v")], axis=-1)
        qkv_b = np.concatenate([sd[f"{src}.{n}.bias"] for n in ("q", "k", "v")])
        return {"norm": gn(src + ".norm"),
                "qkv": {"kernel": qkv_k, "bias": qkv_b},
                "proj_out": dense_from_1x1(src + ".proj_out")}

    def half(prefix, decoder: bool):
        p = {"conv_in": conv(prefix + ".conv_in"),
             "mid_block_1": resblock(prefix + ".mid.block_1"),
             "mid_attn_1": attn(prefix + ".mid.attn_1"),
             "mid_block_2": resblock(prefix + ".mid.block_2"),
             "norm_out": gn(prefix + ".norm_out"),
             "conv_out": conv(prefix + ".conv_out")}
        levels = len(config.ch_mult)
        side = "up" if decoder else "down"
        n_blocks = config.num_res_blocks + (1 if decoder else 0)
        for i in range(levels):
            for j in range(n_blocks):
                src = f"{prefix}.{side}.{i}.block.{j}"
                if src + ".conv1.weight" in sd:
                    p[f"{side}_{i}_block_{j}"] = resblock(src)
                asrc = f"{prefix}.{side}.{i}.attn.{j}"
                if asrc + ".norm.weight" in sd:
                    p[f"{side}_{i}_attn_{j}"] = attn(asrc)
            if decoder and i != 0 and \
                    f"{prefix}.up.{i}.upsample.conv.weight" in sd:
                p[f"up_{i}_upsample"] = conv(f"{prefix}.up.{i}.upsample.conv")
            if not decoder and i != levels - 1 and \
                    f"{prefix}.down.{i}.downsample.conv.weight" in sd:
                p[f"down_{i}_downsample"] = conv(
                    f"{prefix}.down.{i}.downsample.conv")
        return p

    params = {
        "encoder": half("encoder", decoder=False),
        "decoder": half("decoder", decoder=True),
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }
    return {"params": params}


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantizer with straight-through gradients (the
    taming-transformers VectorQuantizer2 the reference VQModel imports,
    autoencoder.py:6,39-41; taming itself is not vendored in the reference).
    z NHWC with channels == embed_dim."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed,
                maxval=1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        flat = z.reshape(-1, self.embed_dim)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             - 2.0 * flat @ codebook.T
             + jnp.sum(codebook ** 2, axis=1)[None, :])
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
                + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])


class VQModel(nn.Module):
    """VQ first stage (autoencoder.py:14-282, VQModelInterface convention:
    `encode` returns the PRE-quant latent; `decode` quantizes unless
    force_not_quantize). Used by the class-conditional ImageNet LDMs."""

    config: VAEConfig
    n_embed: int = 16384
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        assert not cfg.double_z, "VQ first stage uses double_z=False"
        self.encoder = VAEEncoder(cfg, self.dtype, name="encoder")
        self.decoder = VAEDecoder(cfg, self.dtype, name="decoder")
        self.quantize = VectorQuantizer(self.n_embed, cfg.embed_dim,
                                        name="quantize")
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x, *, deterministic=True):
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode(self, h, *, force_not_quantize=False, deterministic=True):
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(h),
                            deterministic=deterministic)

    def __call__(self, x, *, deterministic=True):
        h = self.encode(x, deterministic=deterministic)
        z_q, loss, idx = self.quantize(h)
        rec = self.decoder(self.post_quant_conv(z_q),
                           deterministic=deterministic)
        return rec, loss, idx

    def forward_trunk(self, x, *, deterministic=True):
        """Training forward split at the decoder's final conv: returns
        (pre-conv_out activations, codebook_loss, indices)."""
        h = self.encode(x, deterministic=deterministic)
        z_q, loss, idx = self.quantize(h)
        trunk = self.decoder(self.post_quant_conv(z_q), return_trunk=True,
                             deterministic=deterministic)
        return trunk, loss, idx


def convert_vq_model(state_dict, config: VAEConfig) -> dict:
    """LDM VQModel torch state dict -> our params (accepts
    `first_stage_model.`-prefixed full checkpoints)."""
    base = convert_autoencoder_kl(state_dict, config)
    sd = {k[len("first_stage_model."):] if k.startswith("first_stage_model.")
          else k: np.asarray(v) for k, v in state_dict.items()}
    params = base["params"]
    params["quantize"] = {"embedding": sd["quantize.embedding.weight"]}
    return {"params": params}
