"""Latent-diffusion training step (p_losses twin, ddpm.py:294-345).

Checks: loss decreases on a fixable objective, the three parameterization
targets match their closed forms, frozen-VAE encode path runs with the VAE
params passed as arguments (not HLO constants), and cond dropout swaps in
the unconditional context at the expected rate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
from dpm_solver_tpu.pipelines import make_ldm_betas
from dpm_solver_tpu.training import (
    make_latent_train_step,
    make_train_state,
    vae_encode_fn,
)
from dpm_solver_tpu.training.train import make_optimizer

D = 8
BETAS = make_ldm_betas(50)  # short schedule keeps tables tiny


def _tiny_unet(z_ch=4):
    cfg = ADMConfig(image_size=8, in_channels=z_ch, model_channels=32,
                    out_channels=z_ch, num_res_blocks=1,
                    attention_resolutions=(2,), channel_mult=(1, 2),
                    num_heads=2, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=D)
    unet = ADMUNet(config=cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, z_ch)),
                       jnp.ones((1,)), None, jnp.zeros((1, 3, D)),
                       deterministic=True)
    apply = lambda p, z, t, c: unet.apply(p, z, t, None, c,
                                          deterministic=True)
    return apply, params


def test_latent_step_trains_on_latents():
    apply, params = _tiny_unet()
    tx = make_optimizer(lr=2e-3, warmup=0)
    state, _ = make_train_state(params, tx=tx)
    step = jax.jit(make_latent_train_step(apply, tx, BETAS))

    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)) * 0.3
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 3, D))
    losses = []
    for i in range(30):
        state, m = step(state, None, z, ctx, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1]) and float(m["grad_norm"]) > 0.0
    assert int(state.step) == 30
    # the eps objective is learnable; average loss must drop
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA tracks but lags params
    pl = jax.tree.leaves(state.params)[0]
    el = jax.tree.leaves(state.ema_params)[0]
    assert float(jnp.abs(pl - el).max()) > 0.0


@pytest.mark.parametrize("param", ["eps", "x0", "v"])
def test_parameterization_targets(param):
    """With a unet that predicts exactly the closed-form target, the loss is
    zero — proves the target formulas."""
    alphas_cumprod = np.cumprod(1.0 - BETAS)
    sa = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
    ss = jnp.asarray(np.sqrt(1.0 - alphas_cumprod), jnp.float32)

    z0 = jax.random.normal(jax.random.PRNGKey(3), (3, 4, 4, 2))

    def oracle_apply(params, z_t, t_f, ctx):
        t = t_f.astype(jnp.int32)
        a = sa[t][:, None, None, None]
        s = ss[t][:, None, None, None]
        # invert q_sample: eps = (z_t - a z0)/s given the TRUE z0 (closure)
        eps = (z_t - a * z0) / s
        if param == "eps":
            return eps
        if param == "x0":
            return z0
        return a * eps - s * z0

    tx = make_optimizer(lr=0.0, warmup=0)
    state, _ = make_train_state({"w": jnp.zeros(1)}, tx=tx)
    step = jax.jit(make_latent_train_step(oracle_apply, tx, BETAS,
                                          parameterization=param))
    ctx = jnp.zeros((3, 1, D))
    _, m = step(state, None, z0, ctx, jax.random.PRNGKey(4))
    assert float(m["loss"]) < 1e-9


def test_frozen_vae_encode_path():
    apply, params = _tiny_unet(z_ch=4)
    vae = AutoencoderKL(config=VAEConfig.tiny(resolution=16,
                                              attn_resolutions=()))
    vae_params = vae.init(jax.random.PRNGKey(5), jnp.zeros((1, 16, 16, 3)))
    tx = make_optimizer(warmup=0)
    state, _ = make_train_state(params, tx=tx)
    step = jax.jit(make_latent_train_step(
        apply, tx, BETAS, encode_fn=vae_encode_fn(vae)))
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 3),
                              minval=-1.0, maxval=1.0)
    ctx = jnp.zeros((2, 3, D))
    state, m = step(state, vae_params, imgs, ctx, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))
    # the VAE is frozen: its params are untouched inputs, the unet trains
    assert int(state.step) == 1


def test_cond_dropout_uses_uncond_context():
    """With cond_dropout=1.0 every context is replaced: training with the
    real context vs garbage context must give identical losses."""
    apply, params = _tiny_unet()
    tx = make_optimizer(lr=0.0, warmup=0)
    uc = np.zeros((3, D), np.float32)
    step = jax.jit(make_latent_train_step(
        apply, tx, BETAS, cond_dropout=1.0, uncond_context=uc))
    state, _ = make_train_state(params, tx=tx)
    z = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 4))
    rng = jax.random.PRNGKey(9)
    ctx_a = jax.random.normal(jax.random.PRNGKey(10), (2, 3, D))
    ctx_b = jax.random.normal(jax.random.PRNGKey(11), (2, 3, D))
    _, ma = step(state, None, z, ctx_a, rng)
    _, mb = step(state, None, z, ctx_b, rng)
    assert float(ma["loss"]) == float(mb["loss"])

    with pytest.raises(ValueError):
        make_latent_train_step(apply, tx, BETAS, cond_dropout=0.1)


def test_train_latent_loop_and_cli_resume(tmp_path):
    """run_lib.train_latent: trains, meta-checkpoints, resumes; the CLI
    `train-latent --tiny` drives the same loop from an npz."""
    import numpy as np

    from dpm_solver_tpu import cli, run_lib
    from dpm_solver_tpu.models.adm_unet import ADMConfig
    from dpm_solver_tpu.models.vae import VAEConfig

    ucfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                     out_channels=4, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2, use_spatial_transformer=True,
                     transformer_depth=1, context_dim=16)
    vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                     embed_dim=4, resolution=16)
    rs = np.random.default_rng(0)

    def it():
        while True:
            yield (rs.standard_normal((2, 16, 16, 3)).astype(np.float32) * .5,
                   rs.standard_normal((2, 3, 16)).astype(np.float32))

    wd = tmp_path / "run"
    st = run_lib.train_latent("sd_v1", it(), workdir=str(wd),
                              unet_config=ucfg, vae_config=vcfg,
                              max_steps=3, log_freq=1,
                              snapshot_freq_for_preemption=2,
                              snapshot_freq=100)
    assert int(st.step) == 3
    # resume restores the meta checkpoint (step 2) and continues to 4
    st2 = run_lib.train_latent("sd_v1", it(), workdir=str(wd),
                               unet_config=ucfg, vae_config=vcfg,
                               max_steps=4, log_freq=1,
                               snapshot_freq_for_preemption=100,
                               snapshot_freq=100)
    assert int(st2.step) == 4

    npz = tmp_path / "data.npz"
    np.savez(npz, images=(rs.random((6, 16, 16, 3)) * 255).astype(np.uint8))
    cli.main(["train-latent", "--tiny", "--data-path", str(npz),
              "--workdir", str(tmp_path / "cli_run"), "--max-steps", "2",
              "--batch-size", "2", "--log-freq", "1",
              "--optimizer", "adafactor", "--remat"])


def test_latent_step_with_adafactor_and_remat():
    """The one-chip SD fine-tune recipe (benchmarks/sd_latent_train_bench.py):
    adafactor (factored second moment — no 2xP Adam states) + per-block
    remat, through the same make_latent_train_step/make_train_state pair.
    The reference's Lightning harness pins Adam (main.py configure_optimizers);
    fitting the 866M UNet on one 16 GiB chip is why the optimizer is
    swappable here."""
    import dataclasses

    import optax

    cfg = ADMConfig(image_size=8, in_channels=4, model_channels=32,
                    out_channels=4, num_res_blocks=1,
                    attention_resolutions=(2,), channel_mult=(1, 2),
                    num_heads=2, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=D, remat=True)
    unet = ADMUNet(config=cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.ones((1,)), None, jnp.zeros((1, 3, D)),
                       deterministic=True)
    apply = lambda p, z, t, c: unet.apply(p, z, t, None, c,
                                          deterministic=True)
    tx = optax.adafactor(learning_rate=2e-3)
    state, _ = make_train_state(params, tx=tx)
    # factored second moment: total optimizer-state elements must be far
    # below the 2x param count Adam would carry (the point of the recipe)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    n_opt = sum(int(np.prod(np.asarray(a).shape))
                for a in jax.tree.leaves(state.opt_state)
                if hasattr(a, "shape"))
    assert n_opt < n_params  # Adam would be 2x n_params

    step = jax.jit(make_latent_train_step(apply, tx, BETAS))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)) * 0.3
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 3, D))
    losses = []
    for i in range(30):
        state, m = step(state, None, z, ctx, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # remat parity: the rematted apply computes the same function
    cfg_plain = dataclasses.replace(cfg, remat=False)
    out_r = unet.apply(params, z, jnp.ones((4,)), None, ctx,
                       deterministic=True)
    out_p = ADMUNet(config=cfg_plain).apply(params, z, jnp.ones((4,)), None,
                                            ctx, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               atol=1e-5, rtol=1e-5)
