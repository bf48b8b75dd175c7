"""DiffEdit pipeline tests on tiny random-init modules.

The two mask extremes pin the blend semantics down exactly:
  * mask == 1 everywhere (edit all): correcting_xt_fn is the identity, so the
    result must equal plain sampling from the same x_T;
  * mask == 0 everywhere (edit nothing): every correction overwrites x with
    the blend target, so the final latent must be the last blend entry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.text_encoder import constant_context_encoder
from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
from dpm_solver_tpu.pipelines import DPMSolverSampler, LatentDiffusion
from dpm_solver_tpu.pipelines.diffedit import compute_edit_mask, diffedit


@pytest.fixture(scope="module")
def tiny_ldm():
    ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                     out_channels=4, num_res_blocks=1,
                     attention_resolutions=(1,), channel_mult=(1, 2),
                     num_heads=2, use_spatial_transformer=True,
                     transformer_depth=1, context_dim=24)
    vcfg = VAEConfig.tiny(resolution=16, attn_resolutions=())
    unet, vae = ADMUNet(config=ucfg), AutoencoderKL(config=vcfg)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.ones((1,)), None,
                   jnp.zeros((1, 7, 24)), deterministic=True)
    # un-zero the zero-init heads so conditioning influences the output
    up = jax.tree_util.tree_map_with_path(
        lambda p, v: jax.random.normal(jax.random.PRNGKey(11), v.shape) * 0.05
        if ("proj_out" in jax.tree_util.keystr(p)
            or "out_conv" in jax.tree_util.keystr(p))
        and "kernel" in jax.tree_util.keystr(p) else v, up)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)))
    return LatentDiffusion(unet=unet, unet_params=up, vae=vae, vae_params=vp,
                           text_encode=constant_context_encoder(24))


@pytest.fixture(scope="module")
def init_image():
    return jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (1, 16, 16, 3)).astype(np.float32))


def test_diffedit_runs_both_encode_types(tiny_ldm, init_image):
    for mode in ("stochastic", "deterministic"):
        img, mask = diffedit(tiny_ldm, init_image, "src", "dst", steps=6,
                             encode_type=mode, rng=jax.random.PRNGKey(1),
                             return_mask=True)
        img = np.asarray(img)
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(img).all()
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_diffedit_mask_one_equals_plain_sampling(tiny_ldm, init_image):
    mask = jnp.ones((8, 8))
    img = diffedit(tiny_ldm, init_image, "src", "dst", steps=6,
                   encode_type="deterministic", rng=jax.random.PRNGKey(2),
                   mask=mask, guidance_scale=3.0)
    # reproduce manually: encode then sample without any corrector
    sampler = DPMSolverSampler(tiny_ldm)
    uc = tiny_ldm.get_learned_conditioning([""])
    src = tiny_ldm.get_learned_conditioning(["src"])
    dst = tiny_ldm.get_learned_conditioning(["dst"])
    z0 = tiny_ldm.encode_first_stage(init_image)
    t_enc = sampler.ratio_to_time(0.6)
    z_enc, _ = sampler.encode(6, z0, 0.6, conditioning=src,
                              unconditional_guidance_scale=3.0,
                              unconditional_conditioning=uc, order=2,
                              lower_order_final=False)
    lat, _ = sampler.sample(6, 1, z_enc.shape[1:], dst,
                            unconditional_guidance_scale=3.0,
                            unconditional_conditioning=uc, x_T=z_enc,
                            t_start=t_enc, order=2, lower_order_final=False)
    want = jnp.clip((tiny_ldm.decode_first_stage(lat) + 1) / 2, 0, 1)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=1e-5)


def test_diffedit_mask_zero_returns_last_blend_target(tiny_ldm, init_image):
    """With nothing editable every correction overwrites x with the blend
    target, so the output must equal the decode of the LAST blend entry
    (z0 re-noised to t_0 with the reproducible per-step rng)."""
    from dpm_solver_tpu.solver.plan import get_time_steps

    steps, rng = 6, jax.random.PRNGKey(3)
    mask = jnp.zeros((8, 8))
    img = diffedit(tiny_ldm, init_image, "src", "dst", steps=steps,
                   encode_type="stochastic", rng=rng, mask=mask)
    sampler = DPMSolverSampler(tiny_ldm)
    z0 = tiny_ldm.encode_first_stage(init_image)
    _, rng_noise = jax.random.split(rng)
    ns = sampler.noise_schedule
    grid = get_time_steps(ns, "time_uniform", sampler.ratio_to_time(0.6),
                          1.0 / ns.total_N, steps)
    z_last = sampler.stochastic_encode(
        z0, sampler.time_to_ratio(float(grid[steps])),
        rng=jax.random.fold_in(rng_noise, steps))
    want = jnp.clip((tiny_ldm.decode_first_stage(z_last) + 1) / 2, 0, 1)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=1e-5)


def test_compute_edit_mask_shapes(tiny_ldm, init_image):
    sampler = DPMSolverSampler(tiny_ldm)
    z0 = tiny_ldm.encode_first_stage(init_image)
    src = tiny_ldm.get_learned_conditioning(["a"])
    dst = tiny_ldm.get_learned_conditioning(["b"])
    mask = compute_edit_mask(tiny_ldm, sampler, z0, src, dst,
                             jax.random.PRNGKey(4))
    assert mask.shape == (8, 8)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}
