"""End-to-end first-stage adversarial training smoke (KL + VQ).

The reference trains its autoencoders through PyTorch-Lightning's
two-optimizer loop (examples/stable-diffusion/ldm/models/autoencoder.py +
modules/losses); here one jitted step runs both passes. These tests check
the whole assembly on tiny models: shapes, finiteness, both optimizers
actually move their params, the adversarial term stays gated before
disc_start, and the reconstruction objective goes down.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig, VQModel
from dpm_solver_tpu.models.lpips import LPIPS
from dpm_solver_tpu.models.discriminator import NLayerDiscriminator
from dpm_solver_tpu.training import perceptual as P
from dpm_solver_tpu.training.autoencoder import (
    bind_autoencoder, make_adversarial_state, make_kl_train_step,
    make_vq_train_step)


def _tree_l2_diff(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def _setup(kind):
    cfg = VAEConfig.tiny(resolution=16, attn_resolutions=(),
                         double_z=(kind == "kl"))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 16, 16, 3), minval=-1.0, maxval=1.0)
    if kind == "kl":
        model = AutoencoderKL(cfg)
        ae_params = model.init(rng, x, rng)["params"]
    else:
        model = VQModel(cfg, n_embed=32)
        ae_params = model.init(rng, x)["params"]
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    disc_vars = disc.init(jax.random.PRNGKey(1), x)
    lpips = LPIPS()
    lp_params = lpips.init(jax.random.PRNGKey(2), x, x)
    # constant-1.0 lin inits are fine for a smoke; perturb so it's not a
    # no-op metric
    lp_params = jax.tree.map(
        lambda a: a + 0.01 * np.float32(1.0), lp_params)
    return model, ae_params, disc, disc_vars, lpips, lp_params, x


@pytest.mark.parametrize("kind", ["kl", "vq"])
def test_adversarial_train_step_runs_and_learns(kind):
    model, ae_params, disc, disc_vars, lpips, lp_params, x = _setup(kind)
    fns = bind_autoencoder(model, disc, lpips)
    state, tx = make_adversarial_state(ae_params, disc_vars, lr=1e-3)

    if kind == "kl":
        cfg = P.KLLossConfig(disc_start=2, kl_weight=1e-6,
                             perceptual_weight=0.5)
        step = make_kl_train_step(cfg, tx=tx, **fns)
    else:
        cfg = P.VQLossConfig(disc_start=2, codebook_weight=1.0,
                             perceptual_weight=0.5)
        step = make_vq_train_step(cfg, tx=tx, n_embed=32, **fns)

    jstep = jax.jit(step)
    rng = jax.random.PRNGKey(3)
    logs0 = None
    prev_gen, prev_disc = state.gen_params, state.disc_params
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, logs = jstep(state, x, sub, lp_params)
        if logs0 is None:
            logs0 = logs
        for k, v in logs.items():
            assert np.isfinite(np.asarray(v)).all(), (k, v)

    # both optimizers moved their params
    assert _tree_l2_diff(prev_gen["ae"], state.gen_params["ae"]) > 0
    assert _tree_l2_diff(prev_disc, state.disc_params) > 0
    assert int(state.step) == 5

    # adversarial term gated before disc_start (step 0 -> factor 0)
    assert float(logs0["train/disc_factor"]) == 0.0
    assert float(logs["train/disc_factor"]) == 1.0
    # reconstruction objective decreased over the 5 steps
    key = "train/nll_loss" if kind == "kl" else "train/rec_loss"
    assert float(logs[key]) < float(logs0[key])
    if kind == "vq":
        assert "train/perplexity" in logs


def test_kl_logvar_is_trained():
    model, ae_params, disc, disc_vars, lpips, lp_params, x = _setup("kl")
    fns = bind_autoencoder(model, disc, lpips)
    state, tx = make_adversarial_state(ae_params, disc_vars, lr=1e-3,
                                       logvar_init=0.3)
    cfg = P.KLLossConfig(disc_start=100)
    step = jax.jit(make_kl_train_step(cfg, tx=tx, **fns))
    assert float(state.gen_params["logvar"]) == pytest.approx(0.3)
    state, _ = step(state, x, jax.random.PRNGKey(0), lp_params)
    assert float(state.gen_params["logvar"]) != pytest.approx(0.3)


def test_run_lib_train_autoencoder_resume_and_images(tmp_path):
    """Preemption-safe first-stage loop + ImageLogger-equivalent grids +
    CLI smoke (ref main.py harness semantics)."""
    import os

    from dpm_solver_tpu.models.vae import VAEConfig
    from dpm_solver_tpu.run_lib import train_autoencoder
    from dpm_solver_tpu.training.perceptual import KLLossConfig

    rng = np.random.default_rng(0)

    def gen():
        while True:
            yield rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)

    batches = gen()
    cfg = VAEConfig.tiny(resolution=16, attn_resolutions=())
    kw = dict(workdir=str(tmp_path), kind="kl", vae_config=cfg,
              loss_config=KLLossConfig(disc_start=1, perceptual_weight=0.0),
              disc_ndf=8, disc_n_layers=2, lr=1e-4,
              snapshot_freq_for_preemption=2, snapshot_freq=100,
              image_freq=3, log_freq=2)
    state = train_autoencoder(gen(), max_steps=4, **kw)
    assert int(state.step) == 4
    # resumes from the step-2 meta checkpoint, continues to 5
    state2 = train_autoencoder(batches, max_steps=5, **kw)
    assert int(state2.step) == 5
    recon = os.path.join(str(tmp_path), "recon")
    assert any(f.endswith(".png") for f in os.listdir(recon))


def test_cli_train_ae_tiny(tmp_path, capsys):
    from dpm_solver_tpu import cli

    rng = np.random.default_rng(1)
    npz = tmp_path / "data.npz"
    np.savez(npz, images=(rng.random((8, 16, 16, 3)) * 255)
             .astype(np.uint8))
    cli.main(["train-ae", "--tiny", "--kind", "vq",
              "--data-path", str(npz),
              "--workdir", str(tmp_path / "wd"),
              "--batch-size", "2", "--max-steps", "2",
              "--disc-start", "0", "--perceptual-weight", "0.5",
              "--log-freq", "1"])
    assert "finished at step 2" in capsys.readouterr().out
