"""Concat/hybrid LDM conditioning (DiffusionWrapper twin) + SR pipeline.

Reference: ldm/models/diffusion/ddpm.py:1396-1416 routes `c_concat` onto
the UNet input channels and `c_crossattn` into the context; the bsr-sr
models use conditioning_key='concat' with an identity cond stage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.vae import VAEConfig, VQModel
from dpm_solver_tpu.pipelines.stable_diffusion import (
    LatentDiffusion, StableDiffusionPipeline)


@pytest.fixture(scope="module")
def sr_bundle():
    zc = 4
    ucfg = ADMConfig(image_size=8, in_channels=zc + 3, out_channels=zc,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2))
    unet = ADMUNet(config=ucfg)
    x = jnp.zeros((1, 8, 8, zc + 3))
    uparams = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), None,
                        None, deterministic=True)
    # the output conv is zero-init (reference zero_module convention) —
    # perturb every param so the forward actually depends on its inputs
    uparams = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(9),
                                               a.shape, a.dtype), uparams)

    vcfg = VAEConfig.tiny(resolution=16, attn_resolutions=(),
                          double_z=False, z_channels=zc, embed_dim=zc)
    vae = VQModel(vcfg, n_embed=16)
    vparams = {"params": vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))["params"]}
    model = LatentDiffusion(unet=unet, unet_params=uparams, vae=vae,
                            vae_params=vparams, scale_factor=1.0,
                            conditioning_key="concat")
    return model, zc


def test_apply_model_concat_routes_channels(sr_bundle):
    model, zc = sr_bundle
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, zc)).astype(np.float32))
    lr = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([3.0, 7.0])

    out_dict = model.apply_model(x, t, {"c_concat": lr})
    out_list = model.apply_model(x, t, {"c_concat": [lr]})
    out_raw = model.apply_model(x, t, lr)  # conditioning_key routes concat
    np.testing.assert_allclose(np.asarray(out_dict), np.asarray(out_list))
    np.testing.assert_allclose(np.asarray(out_dict), np.asarray(out_raw))
    assert out_dict.shape == (2, 8, 8, zc)
    # the concat channels matter
    out_other = model.apply_model(x, t, {"c_concat": lr + 1.0})
    assert float(jnp.max(jnp.abs(out_other - out_dict))) > 1e-6


def test_upscale_pipeline_shapes(sr_bundle):
    model, zc = sr_bundle
    pipe = StableDiffusionPipeline(model)
    lr = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 8, 8, 3)).astype(np.float32))
    out = pipe.upscale(lr, steps=4, order=2, rng=jax.random.PRNGKey(2))
    assert out.shape == (1, 16, 16, 3)
    a = np.asarray(out)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0


def test_crossattn_dict_equals_raw_context():
    zc = 4
    ucfg = ADMConfig(image_size=8, in_channels=zc, out_channels=zc,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     use_spatial_transformer=True, context_dim=16,
                     num_heads=2)
    unet = ADMUNet(config=ucfg)
    x = jnp.zeros((1, 8, 8, zc))
    ctx = jnp.zeros((1, 5, 16))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), None,
                       ctx, deterministic=True)
    model = LatentDiffusion(unet=unet, unet_params=params, vae=None,
                            vae_params=None)
    rng = np.random.default_rng(2)
    xr = jnp.asarray(rng.normal(size=(1, 8, 8, zc)).astype(np.float32))
    cr = jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32))
    t = jnp.asarray([11.0])
    np.testing.assert_allclose(
        np.asarray(model.apply_model(xr, t, cr)),
        np.asarray(model.apply_model(xr, t, {"c_crossattn": cr})))
    # hybrid: both context halves concat along sequence
    two = model.apply_model(xr, t, {"c_crossattn": [cr[:, :2], cr[:, 2:]]})
    np.testing.assert_allclose(np.asarray(two),
                               np.asarray(model.apply_model(xr, t, cr)),
                               atol=1e-6)
