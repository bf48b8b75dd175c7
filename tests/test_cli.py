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


def test_cli_unknown_config_error():
    with pytest.raises(KeyError, match="unknown config"):
        main(["sample", "--config", "nope", "--batch", "1"])
