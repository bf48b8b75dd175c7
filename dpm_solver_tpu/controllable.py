"""Controllable generation: PC inpainting, colorization, class-conditional
sampling.

Behavioral twin of examples/score_sde_jax/controllable_generation.py:10-301,
built on this package's functional predictor/corrector registry
(samplers.py) instead of the reference's class hierarchy; each task's full
N-step loop is one `lax.scan` XLA program (the reference pmaps a fori_loop).

The conditioning pattern is shared: run a PC update, then re-impose the
known information at the current noise level (re-noised data for inpainting,
the decoupled luma channel for colorization, a classifier gradient folded
into the score for class conditioning).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.samplers import get_corrector, get_predictor
from dpm_solver_tpu.sde import batch_mul

# Orthonormal basis that isolates the gray-scale (luma) direction in RGB
# (ref controllable_generation.py:121-127).
_COLOR_BASIS = np.array(
    [[5.7735014e-01, -8.1649649e-01, 4.7008697e-08],
     [5.7735026e-01, 4.0824834e-01, 7.0710671e-01],
     [5.7735026e-01, 4.0824822e-01, -7.0710683e-01]], dtype=np.float32)


def decouple(x):
    return jnp.einsum("bhwi,ij->bhwj", x, jnp.asarray(_COLOR_BASIS))


def couple(x):
    return jnp.einsum("bhwi,ij->bhwj", x,
                      jnp.asarray(np.linalg.inv(_COLOR_BASIS)))


def _pc_loop(sde, step_fn, x, rng, eps):
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def body(carry, t):
        rng, x, x_mean = carry
        rng, r1, r2 = jax.random.split(rng, 3)
        x, x_mean = step_fn(r1, r2, x, t)
        return (rng, x, x_mean), ()

    (_, x, x_mean), _ = jax.lax.scan(body, (rng, x, x), timesteps)
    return x, x_mean


def get_pc_inpainter(
    sde,
    score_fn: Callable,
    *,
    predictor: str = "reverse_diffusion",
    corrector: str = "langevin",
    snr: float = 0.16,
    n_corrector_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """Returns `inpaint(rng, data, mask) -> x`; mask==1 marks known pixels
    (ref controllable_generation.py:10-95)."""
    pred = get_predictor(predictor)
    corr = get_corrector(corrector)

    def constrain(rng, x, x_mean, data, mask, tb):
        known_mean, std = sde.marginal_prob(data, tb)
        known = known_mean + batch_mul(
            std, jax.random.normal(rng, x.shape, x.dtype))
        x = x * (1.0 - mask) + known * mask
        x_mean = x * (1.0 - mask) + known_mean * mask
        return x, x_mean

    def inpaint(rng, data, mask):
        rng, prior_rng = jax.random.split(rng)
        x = data * mask + sde.prior_sampling(prior_rng, data.shape) * (1.0 - mask)

        def step(r1, r2, x, t):
            tb = jnp.full((x.shape[0],), t, x.dtype)
            r1a, r1b = jax.random.split(r1)
            x, x_mean = corr(r1a, x, tb, sde, score_fn, snr, n_corrector_steps)
            x, x_mean = constrain(r1b, x, x_mean, data, mask, tb)
            r2a, r2b = jax.random.split(r2)
            x, x_mean = pred(r2a, x, tb, sde, score_fn, probability_flow)
            x, x_mean = constrain(r2b, x, x_mean, data, mask, tb)
            return x, x_mean

        x, x_mean = _pc_loop(sde, step, x, rng, eps)
        return x_mean if denoise else x

    return inpaint


def get_pc_colorizer(
    sde,
    score_fn: Callable,
    *,
    predictor: str = "reverse_diffusion",
    corrector: str = "langevin",
    snr: float = 0.16,
    n_corrector_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """Returns `colorize(rng, gray) -> x` where `gray` has equal RGB channels
    (ref controllable_generation.py:98-210). The luma channel of the
    decoupled space is pinned to the (re-noised) gray image each step."""
    pred = get_predictor(predictor)
    corr = get_corrector(corrector)

    def luma_mask(x):
        return jnp.concatenate(
            [jnp.ones_like(x[..., :1]), jnp.zeros_like(x[..., 1:])], axis=-1)

    def constrain(rng, x, x_mean, gray, tb):
        mask = luma_mask(x)
        known_mean, std = sde.marginal_prob(decouple(gray), tb)
        known = known_mean + batch_mul(
            std, jax.random.normal(rng, x.shape, x.dtype))
        x = couple(decouple(x) * (1.0 - mask) + known * mask)
        # NB the reference blends the *noised* x into x_mean here too
        # (controllable_generation.py:163-164)
        x_mean = couple(decouple(x) * (1.0 - mask) + known_mean * mask)
        return x, x_mean

    def colorize(rng, gray):
        mask = luma_mask(gray)
        rng, prior_rng = jax.random.split(rng)
        x = couple(decouple(gray) * mask
                   + decouple(sde.prior_sampling(prior_rng, gray.shape))
                   * (1.0 - mask))

        def step(r1, r2, x, t):
            tb = jnp.full((x.shape[0],), t, x.dtype)
            r1a, r1b = jax.random.split(r1)
            x, x_mean = corr(r1a, x, tb, sde, score_fn, snr, n_corrector_steps)
            x, x_mean = constrain(r1b, x, x_mean, gray, tb)
            r2a, r2b = jax.random.split(r2)
            x, x_mean = pred(r2a, x, tb, sde, score_fn, probability_flow)
            x, x_mean = constrain(r2b, x, x_mean, gray, tb)
            return x, x_mean

        x, x_mean = _pc_loop(sde, step, x, rng, eps)
        return x_mean if denoise else x

    return colorize


def get_pc_conditional_sampler(
    sde,
    score_fn: Callable,
    classifier_grad_fn: Callable,
    *,
    predictor: str = "reverse_diffusion",
    corrector: str = "langevin",
    snr: float = 0.16,
    n_corrector_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """Returns `sample(rng, shape, labels) -> x`. The classifier gradient
    grad_x log p(y | x_t) is added to the score — the noise-conditional
    classifier pattern (ref controllable_generation.py:213-301;
    classifier_grad_fn(x, t, labels))."""
    pred = get_predictor(predictor)
    corr = get_corrector(corrector)

    def sample(rng, shape, labels):
        def guided_score(x, t):
            return score_fn(x, t) + classifier_grad_fn(x, t, labels)

        rng, prior_rng = jax.random.split(rng)
        x = sde.prior_sampling(prior_rng, shape)

        def step(r1, r2, x, t):
            tb = jnp.full((x.shape[0],), t, x.dtype)
            x, x_mean = corr(r1, x, tb, sde, guided_score, snr,
                             n_corrector_steps)
            x, x_mean = pred(r2, x, tb, sde, guided_score, probability_flow)
            return x, x_mean

        x, x_mean = _pc_loop(sde, step, x, rng, eps)
        return x_mean if denoise else x

    return sample
