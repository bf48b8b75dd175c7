"""Orchestration tests: config registry, losses, checkpoint/preemption
recovery, resumable evaluation, and the CLI surface."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.configs import Config, DataConfig, EvalConfig, SamplingConfig
from dpm_solver_tpu.configs import TrainingConfig, get_config, list_configs, register_config
from dpm_solver_tpu.models import DDPMUNetConfig
from dpm_solver_tpu.training.checkpoints import (
    CheckpointManager,
    EvalMeta,
    load_eval_meta,
    restore_or_init,
    save_eval_meta,
)
from dpm_solver_tpu.training.train import make_optimizer, make_train_state


def _tiny_config(workdir, **over):
    base = dict(
        name="tiny_test", model_family="ddpm_unet",
        model_config=DDPMUNetConfig.tiny(),
        data=DataConfig(dataset="synthetic", image_size=16, centered=True),
        training=TrainingConfig(batch_size=8, lr=1e-3, warmup=0,
                                snapshot_freq=4,
                                snapshot_freq_for_preemption=2, log_freq=100,
                                continuous=False),
        sampling=SamplingConfig(order=2, steps=4, method="multistep",
                                skip_type="time_uniform"),
        eval=EvalConfig(batch_size=4, num_samples=8, begin_ckpt=4, end_ckpt=4),
        workdir=str(workdir),
    )
    base.update(over)
    return Config(**base)


def test_config_registry():
    names = list_configs()
    for required in ("cifar10_ddpm", "imagenet64_iddpm", "imagenet256_guided",
                     "score_sde_cifar10_vp_deep", "sd_v1"):
        assert required in names
    cfg = get_config("cifar10_ddpm")
    assert cfg.sampling.order == 3 and cfg.sampling.skip_type == "logSNR"
    over = get_config("cifar10_ddpm", seed=7)
    assert over.seed == 7
    with pytest.raises(KeyError):
        get_config("nope")
    guided = get_config("imagenet256_guided")
    assert guided.classifier_config is not None
    assert guided.sampling.thresholding


def test_sde_losses_finite_and_weighting():
    from dpm_solver_tpu.sde import VPSDE
    from dpm_solver_tpu.training.losses import sde_loss_fn

    sde = VPSDE()
    score_fn = lambda p, x, t: -x * p["scale"]
    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 1))
    for lw in (False, True):
        loss = sde_loss_fn(sde, score_fn, likelihood_weighting=lw)(
            {"scale": jnp.asarray(1.0)}, x0, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)) and float(loss) > 0


def test_legacy_losses():
    from dpm_solver_tpu.sde import VESDE, VPSDE
    from dpm_solver_tpu.training.losses import ddpm_loss_fn, smld_loss_fn

    model_fn = lambda p, x, labels: -x
    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 1))
    l1 = smld_loss_fn(VESDE(), model_fn)(None, x0, jax.random.PRNGKey(1))
    l2 = ddpm_loss_fn(VPSDE(), model_fn)(None, x0, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_train_preemption_resume(tmp_path):
    from dpm_solver_tpu.run_lib import train

    config = _tiny_config(tmp_path)
    rng = np.random.RandomState(0)

    def gen():
        while True:
            yield rng.randn(8, 16, 16, 3).astype(np.float32)

    batches = gen()

    # phase 1: train 5 steps (preemption metas at steps 2 and 4)
    state = train(config, batches, max_steps=5)
    assert int(state.step) == 5

    # phase 2 simulates a restart: must resume from the step-4 meta ckpt
    state2 = train(config, batches, max_steps=6)
    assert int(state2.step) == 6
    meta_dir = os.path.join(str(tmp_path), "checkpoints-meta")
    mgr = CheckpointManager(meta_dir)
    assert mgr.latest_step() == 4


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state, tx = make_train_state(params, tx=make_optimizer(1e-3, 0))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state)
    template, _ = make_train_state(
        {"w": jnp.zeros((2, 3))}, tx=make_optimizer(1e-3, 0))
    back = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(back.params["w"]),
                                  np.asarray(params["w"]))
    fresh = restore_or_init(CheckpointManager(str(tmp_path / "empty")),
                            template)
    assert float(fresh.params["w"].sum()) == 0.0


def test_eval_meta_roundtrip(tmp_path):
    meta = EvalMeta(ckpt_id=3, sampling_round_id=7).with_rng(
        jax.random.PRNGKey(5))
    save_eval_meta(meta, str(tmp_path), host_id=0)
    back = load_eval_meta(str(tmp_path), host_id=0)
    assert back.ckpt_id == 3 and back.sampling_round_id == 7
    assert np.array_equal(jax.random.key_data(back.rng),
                          jax.random.key_data(jax.random.PRNGKey(5)))


def test_evaluate_with_resume(tmp_path):
    from dpm_solver_tpu.run_lib import evaluate, train

    config = _tiny_config(tmp_path)
    rng = np.random.RandomState(0)

    def gen():
        while True:
            yield rng.randn(8, 16, 16, 3).astype(np.float32)

    train(config, gen(), max_steps=5)  # writes full ckpt at step 4

    calls = []

    def sample_fn(state, rng):
        calls.append(1)
        return np.zeros((4, 16, 16, 3), np.float32)

    results = evaluate(config, sample_fn=sample_fn, rounds=2)
    assert results[4]["rounds"] == 2
    assert len(calls) == 2
    # eval meta deleted on completion -> a rerun starts fresh
    meta = load_eval_meta(os.path.join(str(tmp_path), "eval"))
    assert meta.ckpt_id == 0

    # simulate preemption mid-eval: write meta saying round 0 done
    save_eval_meta(EvalMeta(ckpt_id=4, sampling_round_id=0),
                   os.path.join(str(tmp_path), "eval"))
    calls.clear()
    evaluate(config, sample_fn=sample_fn, rounds=2)
    assert len(calls) == 1  # only round 1 re-ran


def test_cli_sample_smoke(tmp_path, capsys):
    from dpm_solver_tpu import cli

    @register_config("tiny_cli_test")
    def _tiny():
        return _tiny_config(str(tmp_path))

    cli.main(["sample", "--config", "tiny_cli_test", "--batch", "2",
              "--outdir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "wrote 2 samples" in out
    data = np.load(tmp_path / "out" / "sample.npz")["samples"]
    assert data.shape == (2, 16, 16, 3)
    assert np.isfinite(data).all()
    assert (tmp_path / "out" / "sample_00000.png").exists()


def test_cli_configs_listing(capsys):
    from dpm_solver_tpu import cli

    cli.main(["configs"])
    out = capsys.readouterr().out
    assert "cifar10_ddpm" in out and "sd_v1" in out


def test_cli_sample_guided_class_conditional(tmp_path, capsys):
    """imagenet256_guided-shaped path: class-conditional model with learned
    sigma (out=2*in, mean split) + dynamic thresholding through the CLI."""
    from dpm_solver_tpu import cli
    from dpm_solver_tpu.models import ADMConfig

    @register_config("tiny_guided_test")
    def _tg():
        return Config(
            name="tiny_guided_test", model_family="adm",
            model_config=ADMConfig.tiny(num_classes=10, out_channels=6,
                                        use_scale_shift_norm=True),
            classifier_config=ADMConfig.tiny(out_channels=10,
                                             num_head_channels=16,
                                             pool="attention"),
            data=DataConfig(dataset="synthetic", image_size=16),
            sampling=SamplingConfig(order=2, steps=4, method="multistep",
                                    skip_type="time_uniform",
                                    thresholding=True, classifier_scale=2.5),
            workdir=str(tmp_path))

    cli.main(["sample", "--config", "tiny_guided_test", "--batch", "2",
              "--outdir", str(tmp_path / "out")])
    assert "wrote 2 samples" in capsys.readouterr().out
    data = np.load(tmp_path / "out" / "sample.npz")["samples"]
    assert data.shape == (2, 16, 16, 3)
    assert np.isfinite(data).all()


def test_evaluate_iterates_saved_steps_and_persists_features(tmp_path):
    """Checkpoints are keyed by global training step (4 here, not 1..4);
    evaluate must iterate saved steps only, and FID features must aggregate
    over ALL rounds across a preemption resume."""
    from dpm_solver_tpu.run_lib import evaluate, train

    config = _tiny_config(tmp_path, eval=EvalConfig(
        batch_size=4, num_samples=8, begin_ckpt=1, end_ckpt=100))
    rng = np.random.RandomState(0)

    def gen():
        while True:
            yield rng.randn(8, 16, 16, 3).astype(np.float32)

    train(config, gen(), max_steps=5)  # saves orbax step 4 only

    def sample_fn(state, rng_):
        return np.zeros((4, 16, 16, 3), np.float32)

    def feature_fn(images):
        return np.ones((4, 8), np.float32), np.zeros((4, 5), np.float32)

    # simulate preemption: round 0 done (features already on disk)
    os.makedirs(os.path.join(str(tmp_path), "eval"), exist_ok=True)
    np.savez(os.path.join(str(tmp_path), "eval", "stats_ckpt4_round0.npz"),
             feats=np.ones((4, 8), np.float32),
             logits=np.zeros((4, 5), np.float32))
    save_eval_meta(EvalMeta(ckpt_id=4, sampling_round_id=0),
                   os.path.join(str(tmp_path), "eval"))

    calls = []

    def counting_sample_fn(state, rng_):
        calls.append(1)
        return sample_fn(state, rng_)

    results = evaluate(config, sample_fn=counting_sample_fn,
                       feature_fn=feature_fn, rounds=2,
                       loss_fn=lambda state, rng_: 0.125)
    assert list(results.keys()) == [4]  # only the saved step, not 1..100
    assert len(calls) == 1  # round 0 resumed from disk, only round 1 ran
    assert results[4]["inception_score"] == pytest.approx(1.0)
    assert results[4]["loss"] == 0.125
