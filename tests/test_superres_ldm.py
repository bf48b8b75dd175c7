"""End-to-end blind-SR LDM flow: BSRGAN data -> concat-conditioned latent
training -> upscale sampling.

Ties together the reference's SR stack (ImageNetSR dataloader with
bsrgan_light degradation, concat-mode LatentDiffusion per ddpm.py:442-443,
and sampling over the concat-conditioned UNet) across our components:
`data.superres_dataset`, `training/latent.make_latent_train_step` (the LR
image rides the context slot and is channel-concatenated by the
unet_apply binding), and `StableDiffusionPipeline.upscale`.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.vae import VAEConfig, VQModel
from dpm_solver_tpu.pipelines.stable_diffusion import (
    LatentDiffusion, StableDiffusionPipeline, make_ldm_betas)
from dpm_solver_tpu.training.latent import make_latent_train_step
from dpm_solver_tpu.training.train import make_optimizer, make_train_state


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("sr_images")
    rng = np.random.default_rng(0)
    for i in range(4):
        # smooth images so JPEG/degradation behave like photos
        yy, xx = np.mgrid[0:64, 0:80] / 64.0
        img = np.stack([yy, xx * (i + 1) / 4.0, 0.5 + 0.3 * yy * xx], -1)
        img += 0.05 * rng.random((64, 80, 3))
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                str(d / f"im{i}.png"))
    return str(d)


def test_superres_ldm_train_and_upscale(image_folder):
    from dpm_solver_tpu.data import superres_dataset

    size, f = 16, 2  # HR 16px, VQ-f2 first stage, LR = latent = 8px
    it = superres_dataset(image_folder, size=size, batch_size=2,
                          downscale_f=f, degradation="bsrgan_light",
                          seed=3)
    batch = next(it)
    assert batch["image"].shape == (2, 16, 16, 3)
    assert batch["LR_image"].shape == (2, 8, 8, 3)

    zc = 4
    vcfg = VAEConfig.tiny(resolution=size, attn_resolutions=(),
                          double_z=False, z_channels=zc, embed_dim=zc)
    vae = VQModel(vcfg, n_embed=16)
    vparams = {"params": vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]}

    ucfg = ADMConfig(image_size=size // f, in_channels=zc + 3,
                     out_channels=zc, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1, 2))
    unet = ADMUNet(config=ucfg)
    uparams = unet.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, size // f, size // f, zc + 3)),
                        jnp.zeros((1,)), None, None, deterministic=True)

    betas = make_ldm_betas(100)

    # concat conditioning: the LR image rides the context slot and is
    # channel-concatenated onto z_t (DiffusionWrapper 'concat',
    # ddpm.py:1402-1407)
    def unet_apply(params, z_t, t, lr):
        x = jnp.concatenate([z_t, lr], axis=-1)
        return unet.apply(params, x, t, None, None, deterministic=True)

    def encode_fn(frozen, images, rng):
        z = vae.apply(frozen, images, method=VQModel.encode)
        return jax.lax.stop_gradient(z)

    tx = make_optimizer(1e-3, 0)
    state, _ = make_train_state(uparams, tx=tx)
    step = jax.jit(make_latent_train_step(
        unet_apply, tx, betas, encode_fn=encode_fn))

    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(4):
        batch = next(it)
        state, metrics = step(state, vparams,
                              jnp.asarray(batch["image"]),
                              jnp.asarray(batch["LR_image"]),
                              jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 4

    # sampling through the trained weights: the public upscale pipeline
    model = LatentDiffusion(unet=unet, unet_params=state.ema_params,
                            vae=vae, vae_params=vparams, betas=betas,
                            scale_factor=1.0, conditioning_key="concat")
    pipe = StableDiffusionPipeline(model)
    out = pipe.upscale(jnp.asarray(batch["LR_image"]), steps=4, order=2,
                       rng=jax.random.PRNGKey(5))
    assert out.shape == (2, 16, 16, 3)
    a = np.asarray(out)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
