"""Cascade pipeline + observability utilities tests."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.pipelines.cascade import CascadePipeline, CascadeStage
from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.utils.logging import (
    MetricWriter,
    image_grid,
    save_image_grid,
    wall_timer,
)


def _stage_model(resolution, in_ch):
    """SuperResModel contract: the MODEL concatenates the low-res
    conditioning (super_res_inputs), the pipeline passes raw x + low_res."""
    from dpm_solver_tpu.models.adm_unet import super_res_inputs

    cfg = ADMConfig(image_size=resolution, in_channels=in_ch,
                    model_channels=32, out_channels=3, num_res_blocks=1,
                    attention_resolutions=(), channel_mult=(1, 2),
                    num_heads=1)
    model = ADMUNet(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, resolution, resolution, in_ch)),
                        jnp.ones((1,)), deterministic=True)

    def fn(x, t, c, low):
        if low is not None:
            x = super_res_inputs(x, low)
        return model.apply(params, x, t, deterministic=True)

    return fn


def test_two_stage_cascade_shapes():
    ns = NoiseScheduleVP.discrete(betas=np.linspace(1e-4, 0.02, 1000))
    base = CascadeStage(model=_stage_model(8, 3), noise_schedule=ns,
                        resolution=8, steps=4, order=2)
    upsampler = CascadeStage(model=_stage_model(16, 6), noise_schedule=ns,
                             resolution=16, steps=4, order=2, aug_level=0.25,
                             algorithm_type="sde-dpmsolver++")
    pipe = CascadePipeline([base, upsampler])
    outs = pipe.sample(rng=jax.random.PRNGKey(1), batch=2,
                       return_all_stages=True)
    assert outs[0].shape == (2, 8, 8, 3)
    assert outs[1].shape == (2, 16, 16, 3)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_cascade_deterministic_given_rng():
    ns = NoiseScheduleVP.linear()
    stage = CascadeStage(model=_stage_model(8, 3), noise_schedule=ns,
                         resolution=8, steps=4)
    pipe = CascadePipeline([stage])
    a = pipe.sample(rng=jax.random.PRNGKey(7), batch=1)
    b = pipe.sample(rng=jax.random.PRNGKey(7), batch=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), tensorboard=False)
    w.write(1, loss=0.5, fid=12.0)
    w.write(2, loss=0.25)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["loss"] == 0.5 and lines[0]["fid"] == 12.0
    assert lines[1]["step"] == 2


def test_image_grid_layout(tmp_path):
    imgs = np.random.RandomState(0).rand(5, 4, 4, 3).astype(np.float32)
    grid = image_grid(imgs, ncols=3, pad=1)
    assert grid.shape == (2 * 5 - 1, 3 * 5 - 1, 3)
    np.testing.assert_array_equal(grid[:4, :4], imgs[0])
    save_image_grid(imgs, str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").exists() or (tmp_path / "grid.png.npy").exists()


def test_wall_timer():
    with wall_timer() as t:
        sum(range(1000))
    assert t["seconds"] >= 0.0


def test_metric_writer_csv_and_stdout(tmp_path, capsys):
    """CSV header re-written as new keys appear (reference CSVOutputFormat
    semantics, logger.py:121-150); stdout human format."""
    w = MetricWriter(str(tmp_path), tensorboard=False, csv=True, stdout=True)
    w.write(1, loss=0.5)
    w.write(2, loss=0.25, fid=9.0)
    w.close()
    lines = open(tmp_path / "metrics.csv").read().splitlines()
    assert lines[0] == "step,loss,fid"  # keys extend in arrival order
    assert lines[1].split(",") == ["1", "0.5", ""]
    assert lines[2].split(",") == ["2", "0.25", "9.0"]
    out = capsys.readouterr().out
    assert "loss 0.5" in out and "fid 9" in out
