"""CLI integration tests on the tiny_test config: train -> resume -> eval
(the L4 loop at the real surface, ref main.py --sample/--fid and
score_sde_jax main.py train/eval modes)."""

import os

import numpy as np
import pytest

from dpm_solver_tpu.cli import main


@pytest.fixture(scope="module")
def data_npz(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    imgs = (np.random.RandomState(0).rand(32, 16, 16, 3) * 255).astype(np.uint8)
    path = str(d / "data.npz")
    np.savez(path, images=imgs)
    return path


def test_cli_train_resume_eval(tmp_path, data_npz):
    wd = str(tmp_path / "wd")
    cache = str(tmp_path / "cache")
    main(["--compile-cache", cache, "train", "--config", "tiny_test",
          "--workdir", wd, "--data-path", data_npz, "--max-steps", "3"])
    # snapshot_freq=2 -> a full checkpoint at step 2
    assert os.listdir(os.path.join(wd, "checkpoints"))
    # resume continues from the meta checkpoint
    main(["--compile-cache", cache, "train", "--config", "tiny_test",
          "--workdir", wd, "--data-path", data_npz, "--max-steps", "5"])

    main(["--compile-cache", cache, "eval", "--config", "tiny_test",
          "--workdir", wd, "--rounds", "1", "--data-path", data_npz])
    eval_dir = os.path.join(wd, "eval")
    samples = [f for f in os.listdir(eval_dir) if f.startswith("samples_")]
    assert samples
    arr = np.load(os.path.join(eval_dir, samples[0]))["samples"]
    assert arr.shape == (4, 16, 16, 3)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


def test_cli_sample_random_weights(tmp_path):
    out = str(tmp_path / "out")
    main(["sample", "--config", "tiny_test", "--batch", "2", "--outdir", out])
    arr = np.load(os.path.join(out, "sample.npz"))["samples"]
    assert arr.shape == (2, 16, 16, 3) and np.isfinite(arr).all()


def test_cli_sample_trace_capture(tmp_path):
    """--trace-dir captures an XProf trace of one warm trajectory (the
    observability completion of utils/logging.trace_span; the reference's
    analog is commented CUDA-event timing, runners/diffusion.py:426-449)."""
    out, trace = str(tmp_path / "out"), str(tmp_path / "trace")
    main(["sample", "--config", "tiny_test", "--batch", "2",
          "--outdir", out, "--trace-dir", trace])
    arr = np.load(os.path.join(out, "sample.npz"))["samples"]
    assert arr.shape == (2, 16, 16, 3) and np.isfinite(arr).all()
    captured = [f for _, _, fs in os.walk(trace) for f in fs]
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
               for f in captured), captured


def test_cli_unknown_config_error():
    with pytest.raises(KeyError, match="unknown config"):
        main(["sample", "--config", "nope", "--batch", "1"])


def test_build_sampler_classifier_guidance():
    """The classifier-guided solver assembly (cmd_sample --classifier-ckpt
    path, ref runners/diffusion.py:594-639): class labels + classifier
    log-prob gradient folded into the eps prediction."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu.cli import _build_sampler_from_config
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.models import ADMClassifier, ADMConfig, ADMUNet

    mc = ADMConfig.tiny(num_classes=4, out_channels=6)  # learned-sigma split
    cc = ADMConfig.tiny(num_classes=None, out_channels=4,
                        pool="attention", num_head_channels=16)
    config = dataclasses.replace(
        get_config("imagenet64_iddpm"), model_config=mc, classifier_config=cc,
        data=dataclasses.replace(get_config("imagenet64_iddpm").data,
                                 image_size=16),
        sampling=dataclasses.replace(
            get_config("imagenet64_iddpm").sampling, classifier_scale=2.0,
            steps=4, order=2))

    model = ADMUNet(config=mc)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.ones((2,))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y, deterministic=True)
    classifier = ADMClassifier(config=cc)
    cparams = classifier.init(jax.random.PRNGKey(1), x, t, deterministic=True)

    labels = jnp.asarray([1, 3])
    solver, ns = _build_sampler_from_config(
        config, params, model, labels=labels, classifier=classifier,
        classifier_params=cparams)
    out = solver.sample(jax.random.normal(jax.random.PRNGKey(2), x.shape),
                        steps=4, order=2, method="multistep", t_end=1e-3)
    out = np.asarray(out)
    assert out.shape == x.shape and np.isfinite(out).all()
    # the cosine/4000 table flowed through (not the hardcoded linear one)
    assert ns.total_N < 4000  # clip drops tail entries of the cosine table
    assert ns.total_N > 3000


def test_load_torch_state_dict_prefers_ema(tmp_path):
    """Reference list checkpoints [model, opt, epoch, step, ema]: the EMA
    shadow must win by default (the reference samples from EMA weights,
    runners/diffusion.py:337-341)."""
    import torch

    from dpm_solver_tpu.utils.convert import load_torch_state_dict

    lin = torch.nn.Linear(2, 2)
    raw = {k: v.clone() for k, v in lin.state_dict().items()}
    ema = {k: v + 1.0 for k, v in raw.items() if k.endswith("weight")}
    opt = torch.optim.Adam(lin.parameters()).state_dict()
    path = str(tmp_path / "ckpt.pth")
    torch.save([raw, opt, 3, 1000, ema], path)

    got = load_torch_state_dict(path)
    np.testing.assert_allclose(got["weight"], ema["weight"].numpy())
    np.testing.assert_allclose(got["bias"], raw["bias"].numpy())  # not in ema

    got_raw = load_torch_state_dict(path, prefer_ema=False)
    np.testing.assert_allclose(got_raw["weight"], raw["weight"].numpy())


def test_cli_sample_modes(tmp_path):
    """sequence/interpolation modes (ref runners/diffusion.py:461-522)."""
    import glob

    out = str(tmp_path / "seq")
    main(["sample", "--config", "tiny_test", "--batch", "2",
          "--outdir", out, "--mode", "sequence"])
    assert glob.glob(out + "/seq_step*_*.png")
    assert glob.glob(out + "/sample_*.png")

    out2 = str(tmp_path / "interp")
    main(["sample", "--config", "tiny_test", "--batch", "5",
          "--outdir", out2, "--mode", "interpolation"])
    assert len(glob.glob(out2 + "/sample_*.png")) == 5


def test_slerp_properties():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpm_solver_tpu.samplers import interpolation_grid, slerp

    z1 = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 3))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3))
    np.testing.assert_allclose(np.asarray(slerp(z1, z2, 0.0)), np.asarray(z1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(slerp(z1, z2, 1.0)), np.asarray(z2),
                               rtol=1e-5, atol=1e-6)
    # endpoints preserved, vector alphas give a batch
    grid = interpolation_grid(jax.random.PRNGKey(2), (4, 4, 3), n=7)
    assert grid.shape == (7, 4, 4, 3)
    # slerp keeps norms between the endpoint norms (spherical path)
    mid = np.linalg.norm(np.asarray(slerp(z1, z2, 0.5)))
    assert min(np.linalg.norm(z1), np.linalg.norm(z2)) * 0.8 <= mid


def test_cli_superres_base_samples(tmp_path):
    """SuperRes upsampling flow: --base-samples low-res conditioning
    (ref runners/diffusion.py:420-446, load_data_for_worker)."""
    import glob

    import numpy as np

    rng = np.random.default_rng(0)
    npz = str(tmp_path / "base.npz")
    np.savez(npz, arr_0=rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8))
    out = str(tmp_path / "sr")
    main(["sample", "--config", "tiny_superres", "--batch", "2",
          "--base-samples", npz, "--outdir", out])
    assert len(glob.glob(out + "/sample_*.png")) == 2
    # batch larger than the npz fails loudly, not silently
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["sample", "--config", "tiny_superres", "--batch", "8",
              "--base-samples", npz, "--outdir", out])


def test_cli_devices_validation(tmp_path):
    """--devices larger than the visible device count (or not dividing
    --batch) fails with a clear SystemExit, not an opaque reshape error
    inside make_mesh (ADVICE r4)."""
    import pytest as _pytest

    out = str(tmp_path / "out")
    with _pytest.raises(SystemExit, match="visible"):
        main(["sample", "--config", "tiny_test", "--batch", "64",
              "--devices", "64", "--outdir", out])
    with _pytest.raises(SystemExit, match="divisible"):
        main(["sample", "--config", "tiny_test", "--batch", "3",
              "--devices", "2", "--outdir", out])
