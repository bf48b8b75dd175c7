"""Noise-conditional WideResNet classifier (score_sde's guidance classifier).

Behavioral twin of examples/score_sde_jax/models/
wideresnet_noise_conditional.py:122-330 and the logit/grad plumbing in
models/utils.py:267-329: a GroupNorm WideResNet conditioned on log-sigma via
Gaussian Fourier features, zero-pad/pool residual matching, per-image
standardization, CIFAR mean/std preprocessing, and the class-conditional
score gradient used by `controllable.get_pc_conditional_sampler`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.models.ncsnpp import FourierFeatures

_conv_init = jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _dense_init(key, shape, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(shape[1])
    return jax.random.uniform(key, shape, dtype, -scale, scale)


def _gn_relu(x, name: str, relu: bool = True):
    x = nn.GroupNorm(num_groups=min(x.shape[-1] // 4, 32), epsilon=1e-5,
                     name=name)(x)
    return jax.nn.relu(x) if relu else x


def _residual_add(block_x, orig_x):
    """Pad channels with zeros / avg-pool spatially so shapes match
    (ref :210-226)."""
    stride = orig_x.shape[1] // block_x.shape[1]
    if stride > 1:
        orig_x = nn.avg_pool(orig_x, (stride, stride), (stride, stride))
    extra = block_x.shape[-1] - orig_x.shape[-1]
    if extra > 0:
        orig_x = jnp.pad(orig_x, ((0, 0), (0, 0), (0, 0), (0, extra)))
    return block_x + orig_x


class WRNBlock(nn.Module):
    channels: int
    strides: Tuple[int, int] = (1, 1)
    activate_before_residual: bool = False

    @nn.compact
    def __call__(self, x, temb=None):
        if self.activate_before_residual:
            x = _gn_relu(x, "init_bn")
        orig_x = x
        block_x = x if self.activate_before_residual else _gn_relu(x, "init_bn")
        block_x = nn.Conv(self.channels, (3, 3), self.strides, padding="SAME",
                          use_bias=False, kernel_init=_conv_init,
                          name="conv1")(block_x)
        if temb is not None:
            block_x = block_x + nn.Dense(self.channels, name="temb_proj")(
                jax.nn.swish(temb))[:, None, None, :]
        block_x = _gn_relu(block_x, "bn_2")
        block_x = nn.Conv(self.channels, (3, 3), padding="SAME",
                          use_bias=False, kernel_init=_conv_init,
                          name="conv2")(block_x)
        return _residual_add(block_x, orig_x)


class WideResNetClassifier(nn.Module):
    """x NHWC (preprocessed), sigmas (B,) -> (B, num_outputs) logits."""

    blocks_per_group: int = 4
    channel_multiplier: int = 10
    num_outputs: int = 10

    @nn.compact
    def __call__(self, x, sigmas):
        n = np.prod(x.shape[1:])
        x = (x - jnp.mean(x, axis=(1, 2, 3), keepdims=True)) / jnp.maximum(
            jnp.std(x, axis=(1, 2, 3), keepdims=True), 1.0 / np.sqrt(n))
        temb = FourierFeatures(128, 16.0, name="fourier")(jnp.log(sigmas))
        temb = nn.Dense(512, name="temb_0")(temb)
        temb = nn.Dense(512, name="temb_1")(jax.nn.swish(temb))

        x = nn.Conv(16, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=_conv_init, name="init_conv")(x)
        for g, (ch, strides, abr) in enumerate([
                (16 * self.channel_multiplier, (1, 1), True),
                (32 * self.channel_multiplier, (2, 2), False),
                (64 * self.channel_multiplier, (2, 2), False)]):
            for i in range(self.blocks_per_group):
                x = WRNBlock(ch, strides if i == 0 else (1, 1),
                             activate_before_residual=abr and i == 0,
                             name=f"group{g}_block{i}")(x, temb)
        x = _gn_relu(x, "pre_pool_bn")
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_outputs, kernel_init=_dense_init,
                        name="logits")(x)


def get_logit_fn(classifier: WideResNetClassifier, params) -> Callable:
    """CIFAR-standardized logits (ref models/utils.py:293-315)."""
    mean = jnp.asarray([0.49139968, 0.48215841, 0.44653091])
    std = jnp.asarray([0.24703223, 0.24348513, 0.26158784])

    def logit_fn(data, ve_noise_scale):
        data = (data - mean[None, None, None, :]) / std[None, None, None, :]
        return classifier.apply(params, data, ve_noise_scale)

    return logit_fn


def get_classifier_grad_fn(logit_fn: Callable) -> Callable:
    """grad_x log p(y | x, sigma) (ref models/utils.py:318-329); plugs into
    controllable.get_pc_conditional_sampler as classifier_grad_fn(x, t, y)
    after mapping t -> the VE noise scale."""

    def grad_fn(data, ve_noise_scale, labels):
        def log_prob(d):
            logits = logit_fn(d, ve_noise_scale)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return lp[jnp.arange(labels.shape[0]), labels].sum()

        return jax.grad(log_prob)(data)

    return grad_fn
