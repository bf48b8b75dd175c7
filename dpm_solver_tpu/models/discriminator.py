"""PatchGAN discriminator for first-stage (VAE/VQGAN) adversarial training.

Behavioral twin of `taming.modules.discriminator.model.NLayerDiscriminator`
(+ `weights_init` / `ActNorm`), the network the reference's autoencoder
losses instantiate (examples/stable-diffusion/ldm/modules/losses/
contperceptual.py:22-25, vqperceptual.py:67-71; `taming` is an external
dependency of the reference). Architecture is the pix2pix PatchGAN:

  Conv(ndf, 4x4, s2, p1) -> LeakyReLU(0.2)
  for n in 1..n_layers-1: Conv(ndf*min(2^n,8), 4x4, s2, p1, no-bias) ->
      BatchNorm -> LeakyReLU(0.2)
  Conv(ndf*min(2^n_layers,8), 4x4, s1, p1, no-bias) -> BatchNorm ->
      LeakyReLU(0.2)
  Conv(1, 4x4, s1, p1)                      # patch logits

NHWC throughout. With `use_actnorm=True` the norm is ActNorm (per-channel
affine, data-dependent init — the Glow flavor taming uses) and the convs
keep their bias, matching the torch `use_bias = norm_layer != BatchNorm`.

BatchNorm runs on fp32 batch statistics (training mode, the only mode the
GAN loss uses it in); `mutable=['batch_stats']` maintains the running
moments for checkpoint parity with torch.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def gan_conv_init(key, shape, dtype=jnp.float32):
    """`weights_init` twin: Conv weights ~ N(0, 0.02)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """`weights_init` twin for BatchNorm: scale ~ N(1, 0.02), bias 0."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class ActNorm(nn.Module):
    """Per-channel affine `scale * (x + loc)` (Glow), the taming `ActNorm`
    the discriminator uses when `use_actnorm=True` (logdet unused here).

    taming initializes loc/scale lazily from the first batch; JAX params
    are explicit, so use `actnorm_stats_from_batch` on each norm's input
    activations and write the results into the param tree before training
    (identity init otherwise).
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        return scale * (x + loc)


def actnorm_stats_from_batch(x, epsilon=1e-6):
    """(loc, scale) matching torch ActNorm's lazy init on a batch:
    loc = -per-channel mean, scale = 1/(std + eps). torch Tensor.std is
    Bessel-corrected, hence ddof=1."""
    x = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return (-jnp.mean(x, axis=axes),
            1.0 / (jnp.std(x, axis=axes, ddof=1) + epsilon))


class NLayerDiscriminator(nn.Module):
    """x NHWC -> (B, H', W', 1) patch logits."""

    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    compute_dtype: Any = jnp.float32

    def _norm(self, x, name):
        if self.use_actnorm:
            return ActNorm(name=name)(x)
        return nn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            scale_init=_bn_scale_init, name=name)(x)

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_actnorm
        kw = dict(kernel_size=(4, 4), padding=((1, 1), (1, 1)),
                  kernel_init=gan_conv_init, dtype=self.compute_dtype)
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.ndf, strides=(2, 2), name="conv0", **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * mult, strides=(stride, stride),
                        use_bias=use_bias, name=f"conv{n}", **kw)(x)
            x = self._norm(x.astype(jnp.float32), f"norm{n}")
            x = nn.leaky_relu(x.astype(self.compute_dtype), 0.2)
        x = nn.Conv(1, strides=(1, 1), name="conv_out", **kw)(x)
        return x.astype(jnp.float32)


def convert_torch_discriminator(state_dict, n_layers: int = 3) -> dict:
    """taming `NLayerDiscriminator.main.{i}.*` state dict -> our trees.

    Returns {'params': ..., 'batch_stats': ...} (batch_stats empty for
    ActNorm checkpoints, which store per-channel loc/scale instead of
    BatchNorm weight/bias/running moments). Torch Sequential indices
    follow the layer pattern (conv, relu, [conv, norm, relu]*L, conv).
    """

    def conv(i):
        w = np.asarray(state_dict[f"main.{i}.weight"])
        out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if f"main.{i}.bias" in state_dict:
            out["bias"] = jnp.asarray(np.asarray(state_dict[f"main.{i}.bias"]))
        return out

    params = {"conv0": conv(0)}
    stats = {}
    i = 2
    for n in range(1, n_layers + 1):
        params[f"conv{n}"] = conv(i)
        if f"main.{i + 1}.running_mean" in state_dict:  # BatchNorm
            params[f"norm{n}"] = {
                "scale": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.weight"])),
                "bias": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.bias"])),
            }
            stats[f"norm{n}"] = {
                "mean": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.running_mean"])),
                "var": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.running_var"])),
            }
        else:  # ActNorm: loc/scale shaped (1, C, 1, 1)
            params[f"norm{n}"] = {
                "loc": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.loc"]).reshape(-1)),
                "scale": jnp.asarray(
                    np.asarray(state_dict[f"main.{i + 1}.scale"])
                    .reshape(-1)),
            }
        i += 3
    params["conv_out"] = conv(i)
    return {"params": params, "batch_stats": stats}
