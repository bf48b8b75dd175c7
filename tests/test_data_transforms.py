"""data_transform / inverse_data_transform twins
(ref ddpm_and_guided-diffusion/datasets/__init__.py:184-215)."""

import numpy as np
import torch

from dpm_solver_tpu.configs import DataConfig
from dpm_solver_tpu.data import (
    data_transform,
    inverse_data_transform,
    logit_transform,
)


def _ref_logit(image, lam=1e-6):
    image = lam + (1 - 2 * lam) * image
    return torch.log(image) - torch.log1p(-image)


def test_logit_matches_reference_formula():
    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    want = _ref_logit(torch.from_numpy(x)).numpy()
    got = np.asarray(logit_transform(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_round_trips():
    x = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
    for cfg in (DataConfig(centered=True),
                DataConfig(centered=False),
                DataConfig(centered=False, logit_transform=True)):
        y = data_transform(cfg, x)
        back = np.asarray(inverse_data_transform(cfg, y))
        np.testing.assert_allclose(back, x, rtol=0, atol=1e-5)
    # inverse clips out-of-range model outputs into [0, 1]
    out = np.asarray(inverse_data_transform(
        DataConfig(centered=True), np.array([-3.0, 0.0, 3.0])))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_dequantization_needs_rng():
    import jax

    x = np.zeros((1, 4, 4, 3), np.float32) + 0.5
    cfg = DataConfig(centered=True, uniform_dequantization=True)
    # without rng: deterministic path, no dequant noise
    y0 = np.asarray(data_transform(cfg, x))
    np.testing.assert_allclose(y0, 0.0, atol=1e-6)
    y1 = np.asarray(data_transform(cfg, x, rng=jax.random.PRNGKey(0)))
    assert np.abs(y1).max() > 0  # noise applied
