"""NCSNv2 / NCSNv1 (RefineNet score networks) in Flax, NHWC, TPU-first.

Behavioral twin of the reference legacy score models
(examples/score_sde_jax/models/ncsnv2.py:45-200 and the RefineNet blocks in
models/layers.py:117-441, models/normalization.py:81-140): dilated ResNet
backbone + RefineNet decoder (RCU/MSF/CRP blocks), InstanceNorm++
normalization, geometric sigma ladder indexed by discrete labels. NCSNv1 is
the class-conditional-normalization variant (ConditionalInstanceNorm++ with
a per-label embedded (gamma, alpha, beta)).

The deeper 128/256-px variants (NCSNv2_128/256) reuse exactly these blocks
with extra pyramid levels; `NCSNv2Config.levels` covers them.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric, descending (ref models/utils.py get_sigmas)."""
    return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min),
                              num_scales)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class NCSNv2Config:
    nf: int = 128
    image_size: int = 32
    channels: int = 3
    centered: bool = False
    scale_by_sigma: bool = True
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 232
    interpolation: str = "bilinear"
    conditional_norm: bool = False  # True -> NCSNv1
    # pyramid: per level (channel mult, dilation); level 0 is never
    # downsampled. Defaults are the 32px NCSNv2 (ref ncsnv2.py:45-113);
    # the 128/256px variants just deepen these (ref :202-356).
    level_specs: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 1), (2, 2), (2, 4))
    refine_mults: Tuple[int, ...] = (2, 2, 2, 1)

    @staticmethod
    def cifar10() -> "NCSNv2Config":
        return NCSNv2Config()

    @staticmethod
    def px128() -> "NCSNv2Config":
        return NCSNv2Config(
            image_size=128,
            level_specs=((1, 1), (2, 1), (2, 1), (4, 2), (4, 4)),
            refine_mults=(4, 2, 2, 1, 1))

    @staticmethod
    def px256() -> "NCSNv2Config":
        return NCSNv2Config(
            image_size=256,
            level_specs=((1, 1), (2, 1), (2, 1), (2, 1), (4, 2), (4, 4)),
            refine_mults=(4, 2, 2, 2, 1, 1))

    @staticmethod
    def tiny(**overrides) -> "NCSNv2Config":
        base = dict(nf=16, image_size=16, num_scales=10)
        base.update(overrides)
        return NCSNv2Config(**base)


def _ncsn_init(scale: float = 1.0):
    return jax.nn.initializers.variance_scaling(
        1e-10 if scale == 0 else scale / 3.0, "fan_in", "uniform")


def ncsn_conv(x, features: int, *, kernel: int = 3, dilation: int = 1,
              bias: bool = True, name: str):
    return nn.Conv(features, (kernel, kernel), padding="SAME",
                   kernel_dilation=(dilation, dilation), use_bias=bias,
                   kernel_init=_ncsn_init(), name=name)(x)


class InstanceNormPlus(nn.Module):
    """InstanceNorm++ (ref normalization.py:81-104): instance norm with the
    per-channel means re-injected after standardizing them across channels."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_plus = (means - m) / jnp.sqrt(v + 1e-5)
        h = (x - means[:, None, None, :]) / jnp.sqrt(
            jnp.var(x, axis=(1, 2), keepdims=True) + 1e-5)
        init = lambda key, shape, dtype=jnp.float32: (
            jax.nn.initializers.normal(0.02)(key, shape, dtype) + 1.0)
        h = h + means_plus[:, None, None, :] * self.param(
            "alpha", init, (1, 1, 1, x.shape[-1]))
        h = h * self.param("gamma", init, (1, 1, 1, x.shape[-1]))
        if self.bias:
            h = h + self.param("beta", nn.initializers.zeros,
                               (1, 1, 1, x.shape[-1]))
        return h


class CondInstanceNormPlus(nn.Module):
    """Class-conditional InstanceNorm++ (ref normalization.py:107-140):
    (gamma, alpha, beta) looked up from a per-label embedding."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_plus = (means - m) / jnp.sqrt(v + 1e-5)
        h = (x - means[:, None, None, :]) / jnp.sqrt(
            jnp.var(x, axis=(1, 2), keepdims=True) + 1e-5)
        normal = jax.nn.initializers.normal(0.02)
        if self.bias:
            def init_embed(key, shape, dtype=jnp.float32):
                f = shape[1] // 3
                return jnp.concatenate(
                    [normal(key, (shape[0], 2 * f), dtype) + 1.0,
                     jnp.zeros((shape[0], f), dtype)], axis=-1)

            table = nn.Embed(self.num_classes, 3 * c,
                             embedding_init=init_embed, name="embed")(y)
            gamma, alpha, beta = jnp.split(table, 3, axis=-1)
        else:
            table = nn.Embed(
                self.num_classes, 2 * c,
                embedding_init=lambda k, s, d=jnp.float32: normal(k, s, d) + 1.0,
                name="embed")(y)
            gamma, alpha = jnp.split(table, 2, axis=-1)
            beta = None
        # gamma scales the alpha-reinjected activation too (normalization.py:138)
        h = h + means_plus[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if beta is not None:
            out = out + beta[:, None, None, :]
        return out


def _mean_pool(x):
    return (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2]
            + x[:, 1::2, 1::2]) / 4.0


class NCSNResBlock(nn.Module):
    """Dilated/resampled residual block (ref layers.py:354-441, both the
    unconditional and conditional variants)."""

    out_dim: int
    make_norm: Callable
    resample: Optional[str] = None
    dilation: int = 1
    act: Callable = nn.elu

    @nn.compact
    def __call__(self, x, y=None):
        def apply_norm(h, name):
            mod = self.make_norm(name=name)
            return mod(h) if y is None else mod(h, y)

        # NB the backbone convs keep the default bias=True (layers.py:354-441);
        # only the RefineNet RCU/CRP convs are bias-free
        conv = functools.partial(ncsn_conv, dilation=self.dilation)
        h = self.act(apply_norm(x, "norm1"))
        if self.resample == "down":
            h = conv(h, h.shape[-1], name="conv1")
            h = self.act(apply_norm(h, "norm2"))
            if self.dilation > 1:
                h = conv(h, self.out_dim, name="conv2")
                shortcut = conv(x, self.out_dim, name="shortcut")
            else:
                h = _mean_pool(ncsn_conv(h, self.out_dim, name="conv2"))
                shortcut = _mean_pool(
                    ncsn_conv(x, self.out_dim, kernel=1, name="shortcut"))
        else:
            if self.dilation > 1:
                shortcut = x if self.out_dim == x.shape[-1] else conv(
                    x, self.out_dim, name="shortcut")
                h = conv(h, self.out_dim, name="conv1")
                h = self.act(apply_norm(h, "norm2"))
                h = conv(h, self.out_dim, name="conv2")
            else:
                shortcut = x if self.out_dim == x.shape[-1] else ncsn_conv(
                    x, self.out_dim, kernel=1, name="shortcut")
                h = ncsn_conv(h, self.out_dim, name="conv1")
                h = self.act(apply_norm(h, "norm2"))
                h = ncsn_conv(h, self.out_dim, name="conv2")
        return h + shortcut


class RCU(nn.Module):
    """Residual conv units (ref layers.py:154-170)."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu
    make_norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, y=None):
        i = 0
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                if self.make_norm is not None:
                    x = self.make_norm(name=f"norm{i}")(x, y)
                x = self.act(x)
                x = ncsn_conv(x, self.features, bias=False, name=f"conv{i}")
                i += 1
            x = x + residual
        return x


class CRP(nn.Module):
    """Chained residual pooling (ref layers.py:117-150); v2 uses max pool,
    the conditional v1 variant average pool."""

    features: int
    n_stages: int = 2
    act: Callable = nn.relu
    make_norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, y=None):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            if self.make_norm is not None:
                path = self.make_norm(name=f"norm{i}")(path, y)
                path = nn.avg_pool(path, (5, 5), strides=(1, 1),
                                   padding="SAME")
            else:
                path = nn.max_pool(path, (5, 5), strides=(1, 1),
                                   padding="SAME")
            path = ncsn_conv(path, self.features, bias=False, name=f"conv{i}")
            x = path + x
        return x


class MSF(nn.Module):
    """Multi-scale fusion (ref layers.py:173-229)."""

    shape: Tuple[int, int]
    features: int
    interpolation: str = "bilinear"
    make_norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, xs, y=None):
        method = {"bilinear": "bilinear", "nearest_neighbor": "nearest"}[
            self.interpolation]
        total = 0.0
        for i, xi in enumerate(xs):
            if self.make_norm is not None:
                xi = self.make_norm(name=f"norm{i}")(xi, y)
            h = ncsn_conv(xi, self.features, name=f"conv{i}")
            h = jax.image.resize(h, (h.shape[0], *self.shape, h.shape[-1]),
                                 method)
            total = total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: per-input RCUs -> MSF -> CRP -> output RCU
    (ref layers.py:232-309)."""

    shape: Tuple[int, int]
    features: int
    n_inputs: int
    start: bool = False
    end: bool = False
    interpolation: str = "bilinear"
    act: Callable = nn.relu
    make_norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, xs, y=None):
        hs = []
        for i, xi in enumerate(xs):
            hs.append(RCU(xi.shape[-1], 2, 2, self.act, self.make_norm,
                          name=f"rcu_in{i}")(xi, y))
        if not self.start:
            h = MSF(self.shape, self.features, self.interpolation,
                    self.make_norm, name="msf")(hs, y)
        else:
            h = hs[0]
        h = CRP(self.features, 2, self.act, make_norm=self.make_norm,
                name="crp")(h, y)
        return RCU(self.features, 3 if self.end else 1, 2, self.act,
                   self.make_norm, name="rcu_out")(h, y)


class NCSNv2(nn.Module):
    """x NHWC, labels (B,) int sigma indices -> score (ref ncsnv2.py:45-113;
    `conditional_norm=True` gives NCSNv1, :116-200)."""

    config: NCSNv2Config

    @nn.compact
    def __call__(self, x, labels):
        cfg = self.config
        act = nn.elu
        if cfg.conditional_norm:
            make_norm = functools.partial(CondInstanceNormPlus,
                                          num_classes=cfg.num_scales)
        else:
            make_norm = InstanceNormPlus
        y = labels if cfg.conditional_norm else None
        rb = functools.partial(NCSNResBlock, make_norm=make_norm, act=act)
        ref = functools.partial(
            RefineBlock, interpolation=cfg.interpolation, act=act,
            make_norm=make_norm if cfg.conditional_norm else None)

        h = x if cfg.centered else 2.0 * x - 1.0
        nf = cfg.nf
        h = ncsn_conv(h, nf, name="conv_in")
        # backbone pyramid: level 0 = two plain blocks; each deeper level =
        # one down block + one plain block (the 32/128/256px variants differ
        # only in these specs)
        layers = []
        for i, (mult, dil) in enumerate(cfg.level_specs):
            if i == 0:
                h = rb(mult * nf, name="level0_pre")(h, y)
            else:
                h = rb(mult * nf, resample="down", dilation=dil,
                       name=f"level{i}_down")(layers[-1], y)
            h = rb(mult * nf, dilation=dil, name=f"level{i}_res")(h, y)
            layers.append(h)

        # RefineNet decoder, deepest level first
        r = None
        n_levels = len(cfg.level_specs)
        for j, mult in enumerate(cfg.refine_mults):
            i = n_levels - 1 - j
            inputs = [layers[i]] if r is None else [layers[i], r]
            r = ref(layers[i].shape[1:3], mult * nf, len(inputs),
                    start=(j == 0), end=(j == n_levels - 1),
                    name=f"refine{j}")(inputs, y)
        r4 = r

        if cfg.conditional_norm:
            h = make_norm(name="norm_out")(r4, y)
        else:
            h = make_norm(name="norm_out")(r4)
        h = act(h)
        h = ncsn_conv(h, x.shape[-1], name="conv_out")
        if cfg.scale_by_sigma:
            sigmas = jnp.asarray(get_sigmas(cfg.sigma_min, cfg.sigma_max,
                                            cfg.num_scales))
            used = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
            h = h / used
        return h


def ncsnv2_params_from_reference(ref_params, cfg: NCSNv2Config) -> dict:
    """Reference score_sde_jax NCSNv2 auto-numbered tree -> our layout
    (unconditional variant; the reference NCSNv1 forward is unrunnable —
    its conditional 'down' resblock calls the normalizer partial without
    constructing it, score_sde_jax/models/layers.py:413)."""
    assert not cfg.conditional_norm
    ref = ref_params.get("params", ref_params)

    def resblock(sub, *, resample, dilation, has_shortcut):
        out = {"norm1": dict(sub["InstanceNorm2dPlus_0"]),
               "norm2": dict(sub["InstanceNorm2dPlus_1"])}
        c = 0
        if resample == "down":
            out["conv1"] = dict(sub[f"Conv_{c}"]); c += 1
            if dilation > 1:
                out["conv2"] = dict(sub[f"Conv_{c}"]); c += 1
                out["shortcut"] = dict(sub[f"Conv_{c}"])
            else:
                out["conv2"] = dict(sub["ConvMeanPool_0"]["Conv_0"])
                out["shortcut"] = dict(sub["ConvMeanPool_1"]["Conv_0"])
        else:
            if has_shortcut:
                out["shortcut"] = dict(sub[f"Conv_{c}"]); c += 1
            out["conv1"] = dict(sub[f"Conv_{c}"]); c += 1
            out["conv2"] = dict(sub[f"Conv_{c}"])
        return out

    def rcu(sub, n):
        return {f"conv{i}": dict(sub[f"Conv_{i}"]) for i in range(n)}

    def refine(sub, n_inputs, end):
        out = {}
        for i in range(n_inputs):
            out[f"rcu_in{i}"] = rcu(sub[f"RCUBlock_{i}"], 4)
        if n_inputs > 1:
            out["msf"] = {f"conv{i}": dict(sub["MSFBlock_0"][f"Conv_{i}"])
                          for i in range(n_inputs)}
        out["crp"] = {f"conv{i}": dict(sub["CRPBlock_0"][f"Conv_{i}"])
                      for i in range(2)}
        out["rcu_out"] = rcu(sub[f"RCUBlock_{n_inputs}"],
                             (3 if end else 1) * 2)
        return out

    p = {"conv_in": dict(ref["Conv_0"])}
    rb_i = 0
    for i, (mult, dil) in enumerate(cfg.level_specs):
        if i == 0:
            p["level0_pre"] = resblock(
                ref[f"ResidualBlock_{rb_i}"], resample=None, dilation=1,
                has_shortcut="Conv_2" in ref[f"ResidualBlock_{rb_i}"])
        else:
            p[f"level{i}_down"] = resblock(
                ref[f"ResidualBlock_{rb_i}"], resample="down", dilation=dil,
                has_shortcut=True)
        rb_i += 1
        p[f"level{i}_res"] = resblock(
            ref[f"ResidualBlock_{rb_i}"], resample=None, dilation=dil,
            has_shortcut=False)
        rb_i += 1

    n_levels = len(cfg.level_specs)
    for j in range(len(cfg.refine_mults)):
        p[f"refine{j}"] = refine(ref[f"RefineBlock_{j}"],
                                 1 if j == 0 else 2,
                                 end=(j == n_levels - 1))
    p["norm_out"] = dict(ref["InstanceNorm2dPlus_0"])
    p["conv_out"] = dict(ref["Conv_1"])
    return {"params": p}
