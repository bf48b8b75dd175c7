"""ADM / guided-diffusion / improved-DDPM UNet parity vs the torch reference.

The reference torch modules (pure torch, CPU-runnable) are the oracle:
random-init them, convert the state dict, and require fp32 agreement of the
full forward across the flag matrix (scale-shift norm, resblock up/down,
attention order, head configs, class conditioning), plus the classifier
heads and the SuperRes conditioning path.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference

from dpm_solver_tpu.models.adm_unet import (
    ADMClassifier,
    ADMConfig,
    ADMUNet,
    adm_timestep_embedding,
    super_res_inputs,
)
from dpm_solver_tpu.utils.convert import convert_adm_unet

GUIDED_DIR = REFERENCE_ROOT / "examples" / "ddpm_and_guided-diffusion"


def _import_pkg(name, pkg_dir):
    """Import a reference model package (with relative imports) in isolation."""
    spec = importlib.util.spec_from_file_location(
        name, pkg_dir / "__init__.py",
        submodule_search_locations=[str(pkg_dir)])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_guided():
    _import_pkg("ref_guided", GUIDED_DIR / "models" / "guided_diffusion")
    import ref_guided.unet as unet
    return unet


@pytest.fixture(scope="session")
def ref_iddpm():
    _import_pkg("ref_iddpm", GUIDED_DIR / "models" / "improved_ddpm")
    import ref_iddpm.unet as unet
    return unet


def _forward_pair(torch_model, flax_model, cfg, *, class_cond=False,
                  torch_kwargs=None, x_extra_ch=0):
    import torch

    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_adm_unet(sd, cfg, classifier=not isinstance(
        flax_model, ADMUNet))

    rng = np.random.RandomState(0)
    b = 2
    x = rng.randn(b, cfg.in_channels + x_extra_ch, cfg.image_size,
                  cfg.image_size).astype(np.float32)
    t = np.asarray([3.0, 571.0], dtype=np.float32)
    kwargs = dict(torch_kwargs or {})
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x), torch.from_numpy(t),
                           **kwargs).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jt = jnp.asarray(t)
    if isinstance(flax_model, ADMUNet):
        y = (jnp.asarray(kwargs["y"].numpy()) if class_cond else None)
        got = flax_model.apply(params, jx, jt, y, deterministic=True)
        got = np.asarray(got).transpose(0, 3, 1, 2)
    else:
        got = np.asarray(flax_model.apply(params, jx, jt, deterministic=True))
    return got, want


ADM_MATRIX = {
    "ddpm_style": dict(),
    "adm_full": dict(use_scale_shift_norm=True, resblock_updown=True,
                     use_new_attention_order=True, num_head_channels=16,
                     num_classes=10),
    "iddpm_flags": dict(num_heads=4, channel_mult=(1, 2, 2)),
    "scale_shift_only": dict(use_scale_shift_norm=True, num_heads=1,
                             conv_resample=False),
}


@requires_reference
@pytest.mark.parametrize("name", sorted(ADM_MATRIX))
def test_adm_unet_matches_torch(name, ref_guided):
    import torch

    cfg = ADMConfig.tiny(**ADM_MATRIX[name])
    torch.manual_seed(0)
    tm = ref_guided.UNetModel(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        dropout=0.0, channel_mult=cfg.channel_mult,
        conv_resample=cfg.conv_resample, num_classes=cfg.num_classes,
        num_heads=cfg.num_heads, num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order)
    kwargs = {}
    if cfg.num_classes:
        kwargs["y"] = torch.as_tensor([1, 7])
    got, want = _forward_pair(tm, ADMUNet(config=cfg), cfg,
                              class_cond=bool(cfg.num_classes),
                              torch_kwargs=kwargs)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-5)


@requires_reference
def test_iddpm_unet_matches_torch(ref_iddpm):
    import torch

    cfg = ADMConfig.tiny(num_heads=2)
    torch.manual_seed(1)
    tm = ref_iddpm.UNetModel(
        in_channels=cfg.in_channels, model_channels=cfg.model_channels,
        out_channels=cfg.out_channels, num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=0.0,
        channel_mult=cfg.channel_mult, conv_resample=cfg.conv_resample,
        num_heads=cfg.num_heads)
    got, want = _forward_pair(tm, ADMUNet(config=cfg), cfg)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-5)


@requires_reference
@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_adm_classifier_matches_torch(pool, ref_guided):
    import torch

    cfg = ADMConfig.tiny(out_channels=10, num_head_channels=16, pool=pool)
    torch.manual_seed(2)
    tm = ref_guided.EncoderUNetModel(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        channel_mult=cfg.channel_mult, num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm, pool=pool)
    got, want = _forward_pair(tm, ADMClassifier(config=cfg), cfg)
    assert got.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-5)


@requires_reference
def test_super_res_conditioning_matches_torch(ref_guided):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    lo = rng.randn(2, 3, 8, 8).astype(np.float32)
    want = torch.cat(
        [torch.from_numpy(x),
         F.interpolate(torch.from_numpy(lo), (16, 16), mode="bilinear")],
        dim=1).numpy()
    got = super_res_inputs(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(lo.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=0, atol=1e-5)


@requires_reference
def test_adm_timestep_embedding_matches_torch(ref_guided):
    import torch

    # the nn helper module is a sibling import of the unet module
    nn_mod = sys.modules["ref_guided.nn"]
    t = np.asarray([0.0, 1.0, 3.7, 999.0], dtype=np.float32)
    want = nn_mod.timestep_embedding(torch.from_numpy(t), 32).numpy()
    got = np.asarray(adm_timestep_embedding(jnp.asarray(t), 32))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_fractional_channel_mult_forward():
    """The ImageNet-512 ADM uses channel_mult=(0.5,1,1,2,2,4,4)
    (configs/imagenet512_guided.yml); int(mult*ch) must flow through the
    layout, converter head-planner and forward."""
    import dataclasses as _dc

    cfg = _dc.replace(ADMConfig.imagenet512_guided(), image_size=32,
                      model_channels=64, num_res_blocks=1,
                      attention_resolutions=(8,), channel_mult=(0.5, 1, 2),
                      num_classes=4, num_head_channels=16)
    m = ADMUNet(config=cfg)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.ones((2,))
    y = jnp.zeros((2,), jnp.int32)
    p = jax.jit(lambda r: m.init(r, x, t, y, deterministic=True))(
        jax.random.PRNGKey(0))
    out = m.apply(p, x, t, y, deterministic=True)
    assert out.shape == (2, 32, 32, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_new_config_registry_entries():
    from dpm_solver_tpu.configs import get_config

    c = get_config("imagenet128_guided")
    assert c.sampling.classifier_scale == 1.25
    assert c.classifier_config.pool == "attention"
    assert get_config("imagenet512_guided").model_config.channel_mult[0] == 0.5
    assert get_config("lsun_bedroom").model_config.num_classes is None
    assert get_config("celeba64_ddpm").model_config.ch_mult == (1, 2, 2, 2, 4)


def test_remat_matches_plain_outputs_and_grads():
    """config.remat=True (the reference's use_checkpoint, unet.py:198)
    only changes backward memory behavior: outputs and parameter grads
    match the plain path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu.models import ADMConfig, ADMUNet

    cfg = ADMConfig(image_size=16, model_channels=32, num_res_blocks=1,
                    channel_mult=(1, 2), attention_resolutions=(2,),
                    num_heads=2, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=24, legacy=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.asarray([3.0, 7.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24))
    plain = ADMUNet(config=cfg)
    remat = ADMUNet(config=dataclasses.replace(cfg, remat=True))
    params = plain.init(jax.random.PRNGKey(2), x, t, None, ctx,
                        deterministic=True)

    a = plain.apply(params, x, t, None, ctx, deterministic=True)
    b = remat.apply(params, x, t, None, ctx, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(m):
        return lambda p: jnp.sum(
            m.apply(p, x, t, None, ctx, deterministic=True) ** 2)

    ga = jax.grad(loss(plain))(params)
    gb = jax.grad(loss(remat))(params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-5, rtol=2e-5)
