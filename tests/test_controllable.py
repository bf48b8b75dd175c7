"""Controllable-generation tests on the analytically exact N(0, I) score."""

import numpy as np

import jax
import jax.numpy as jnp

from dpm_solver_tpu.controllable import (
    couple,
    decouple,
    get_pc_colorizer,
    get_pc_conditional_sampler,
    get_pc_inpainter,
)
from dpm_solver_tpu.samplers import get_pc_sampler
from dpm_solver_tpu.sde import VPSDE


def _exact_score(sde):
    def score_fn(x, t):
        mean_coef, sigma = sde.marginal_prob(jnp.ones_like(x), t)
        sigma = sigma.reshape(sigma.shape + (1,) * (x.ndim - sigma.ndim))
        return -x / (mean_coef ** 2 + sigma ** 2)

    return score_fn


def test_color_basis_is_orthonormal_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(couple(decouple(x))),
                               np.asarray(x), atol=1e-5)
    # luma direction: equal RGB maps entirely onto channel 0
    gray = jnp.ones((1, 2, 2, 3))
    d = np.asarray(decouple(gray))
    assert abs(d[..., 0]).min() > 1.0
    np.testing.assert_allclose(d[..., 1:], 0.0, atol=1e-6)


def test_pc_inpainter_keeps_known_region():
    sde = VPSDE(N=100)
    score_fn = _exact_score(sde)
    inpaint = jax.jit(get_pc_inpainter(sde, score_fn, corrector="langevin",
                                       snr=0.16))
    data = jnp.full((4, 8, 8, 1), 0.7)
    mask = jnp.zeros_like(data).at[:, :, :4, :].set(1.0)
    out = np.asarray(inpaint(jax.random.PRNGKey(0), data, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :, :4], 0.7, atol=1e-2)  # known kept
    unknown = out[:, :, 4:]
    assert abs(unknown.mean()) < 0.3 and 0.5 < unknown.std() < 1.5


def test_pc_colorizer_preserves_luma():
    sde = VPSDE(N=100)
    score_fn = _exact_score(sde)
    colorize = jax.jit(get_pc_colorizer(sde, score_fn))
    gray = jnp.full((2, 8, 8, 3), 0.3)
    out = colorize(jax.random.PRNGKey(1), gray)
    assert np.isfinite(np.asarray(out)).all()
    # the luma (decoupled ch 0) must match the input's luma
    np.testing.assert_allclose(np.asarray(decouple(out))[..., 0],
                               np.asarray(decouple(gray))[..., 0], atol=1e-2)


def test_conditional_sampler_with_zero_grad_matches_unconditional():
    sde = VPSDE(N=50)
    score_fn = _exact_score(sde)
    zero_grad = lambda x, t, labels: jnp.zeros_like(x)
    cond = get_pc_conditional_sampler(sde, score_fn, zero_grad,
                                      corrector="langevin")
    uncond = get_pc_sampler(sde, score_fn, predictor="reverse_diffusion",
                            corrector="langevin")
    rng = jax.random.PRNGKey(2)
    shape = (2, 4, 4, 1)
    got = cond(rng, shape, jnp.zeros((2,), jnp.int32))
    # reproduce the prior draw + loop rngs of the conditional sampler
    rng2, prior_rng = jax.random.split(rng)
    x0 = sde.prior_sampling(prior_rng, shape)
    want, _ = uncond(x0, rng2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_conditional_sampler_grad_shifts_samples():
    sde = VPSDE(N=50)
    score_fn = _exact_score(sde)
    push = lambda x, t, labels: 2.0 * jnp.ones_like(x)  # constant upward pull
    cond = get_pc_conditional_sampler(sde, score_fn, push)
    base = get_pc_conditional_sampler(sde, score_fn,
                                      lambda x, t, l: jnp.zeros_like(x))
    rng = jax.random.PRNGKey(3)
    labels = jnp.zeros((4,), jnp.int32)
    hi = np.asarray(cond(rng, (4, 4, 4, 1), labels))
    lo = np.asarray(base(rng, (4, 4, 4, 1), labels))
    assert hi.mean() > lo.mean() + 0.5
