"""NCSNv2 parity vs the reference score_sde_jax implementation, plus the
conditional-norm (NCSNv1) pieces.

The reference NCSNv1 *model* forward is unrunnable (its conditional 'down'
resblock calls the normalizer partial without constructing it,
score_sde_jax/models/layers.py:413), so v1 coverage is: the conditional
InstanceNorm++ against the reference module directly, and a standalone
finite-forward check of our (fixed) conditional model.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.ncsnv2 import (
    CondInstanceNormPlus,
    InstanceNormPlus,
    NCSNv2,
    NCSNv2Config,
    get_sigmas,
    ncsnv2_params_from_reference,
)

SCORE_SDE_JAX = str(REFERENCE_ROOT / "examples" / "score_sde_jax")


@pytest.fixture(scope="session")
def ref_ncsnv2():
    import flax

    if not hasattr(flax, "optim"):
        flax.optim = types.SimpleNamespace(Optimizer=object)  # type: ignore
    if SCORE_SDE_JAX not in sys.path:
        sys.path.insert(0, SCORE_SDE_JAX)
    import models as ref_models  # noqa: F401
    from models import layers as ref_layers
    from models import ncsnv2 as mod
    from models import normalization as norm_mod

    # oracle repair: the reference's ncsn_conv bias_init lambdas take
    # (key, shape) but modern flax passes (key, shape, dtype); re-bind them
    # with dtype-tolerant equivalents (same math: bias drawn like a kernel row)
    import flax.linen as fnn
    import jax.nn as jnn

    def fixed_conv(kernel_size):
        def conv(x, out_planes, stride=1, bias=True, dilation=1, init_scale=1.0):
            scale = 1e-10 if init_scale == 0 else init_scale
            kernel_init = jnn.initializers.variance_scaling(
                scale / 3.0, "fan_in", "uniform")
            kshape = (kernel_size, kernel_size, x.shape[-1], out_planes)
            bias_init = lambda key, shape, dtype=None: kernel_init(
                key, kshape)[0, 0, 0, :]
            return fnn.Conv(out_planes, (kernel_size, kernel_size),
                            strides=(stride, stride), padding="SAME",
                            use_bias=bias,
                            kernel_dilation=(dilation, dilation),
                            kernel_init=kernel_init, bias_init=bias_init)(x)

        return conv

    ref_layers.ncsn_conv3x3 = fixed_conv(3)
    ref_layers.ncsn_conv1x1 = fixed_conv(1)
    mod.conv3x3 = fixed_conv(3)
    return types.SimpleNamespace(ncsnv2=mod, normalization=norm_mod)


def _ref_config(cfg: NCSNv2Config):
    import ml_collections

    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(
        {"centered": cfg.centered, "image_size": cfg.image_size})
    c.model = ml_collections.ConfigDict(dict(
        name="ncsnv2", nf=cfg.nf, scale_by_sigma=cfg.scale_by_sigma,
        sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max,
        num_scales=cfg.num_scales, normalization="InstanceNorm++",
        nonlinearity="elu", interpolation=cfg.interpolation,
        sigma_dist="geometric",
    ))
    return c


@requires_reference
def test_ncsnv2_matches_reference(ref_ncsnv2):
    cfg = NCSNv2Config.tiny()
    ref_model = ref_ncsnv2.ncsnv2.NCSNv2(config=_ref_config(cfg))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.image_size, cfg.image_size, 3))
    x = jax.nn.sigmoid(x)
    labels = jnp.asarray([0, 7])
    ref_params = ref_model.init(jax.random.PRNGKey(0), x, labels, train=False)
    mine = ncsnv2_params_from_reference(ref_params, cfg)

    n_ref = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(ref_params))
    n_mine = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(mine))
    assert n_ref == n_mine

    want = ref_model.apply(ref_params, x, labels, train=False)
    got = NCSNv2(config=cfg).apply(mine, x, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=2e-4)  # sigma division amplifies round-off


@requires_reference
def test_instance_norm_plus_matches_reference(ref_ncsnv2):
    ref_mod = ref_ncsnv2.normalization.InstanceNorm2dPlus()
    mine = InstanceNormPlus()
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 5, 8)) * 2 + 1
    p = ref_mod.init(jax.random.PRNGKey(3), x)
    want = ref_mod.apply(p, x)
    got = mine.apply(p, x)  # same param names: alpha/gamma/beta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@requires_reference
def test_cond_instance_norm_plus_matches_reference(ref_ncsnv2):
    ref_mod = ref_ncsnv2.normalization.ConditionalInstanceNorm2dPlus(
        num_classes=10)
    mine = CondInstanceNormPlus(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 5, 5, 8))
    y = jnp.asarray([0, 3, 9])
    p = ref_mod.init(jax.random.PRNGKey(5), x, y)
    want = ref_mod.apply(p, x, y)
    # reference nests the table under auto-name Embed_0; ours under 'embed'
    mine_p = {"params": {"embed": p["params"]["Embed_0"]}}
    got = mine.apply(mine_p, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_ncsnv1_conditional_model_runs():
    cfg = NCSNv2Config.tiny(conditional_norm=True)
    model = NCSNv2(config=cfg)
    x = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3)))
    labels = jnp.asarray([1, 5])
    params = model.init(jax.random.PRNGKey(7), x, labels)
    out = model.apply(params, x, labels)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sigma_ladder():
    s = get_sigmas(0.01, 50.0, 10)
    assert s[0] == pytest.approx(50.0) and s[-1] == pytest.approx(0.01)
    assert np.all(np.diff(s) < 0)
    ratios = s[:-1] / s[1:]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)  # geometric


@requires_reference
def test_ncsnv2_128_variant_matches_reference(ref_ncsnv2):
    """The deeper 128px pyramid (extra level, 4x channel mults) against the
    reference NCSNv2_128 class."""
    cfg = NCSNv2Config.tiny(
        image_size=32,
        level_specs=((1, 1), (2, 1), (2, 1), (4, 2), (4, 4)),
        refine_mults=(4, 2, 2, 1, 1))
    ref_model = ref_ncsnv2.ncsnv2.NCSNv2_128(config=_ref_config(cfg))
    x = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(8),
                                         (2, 32, 32, 3)))
    labels = jnp.asarray([1, 4])
    ref_params = ref_model.init(jax.random.PRNGKey(9), x, labels, train=False)
    mine = ncsnv2_params_from_reference(ref_params, cfg)
    n_ref = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(ref_params))
    n_mine = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(mine))
    assert n_ref == n_mine
    want = ref_model.apply(ref_params, x, labels, train=False)
    got = NCSNv2(config=cfg).apply(mine, x, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=2e-4)
