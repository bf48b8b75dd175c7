"""Score-matching training losses (score_sde parity layer).

Behavioral twin of examples/score_sde_jax/losses.py:65-178:
  * `sde_loss_fn` — continuous denoising score matching for any SDE family,
    with the paper's sigma^2 weighting or likelihood weighting
    (arXiv:2101.09258) and mean/sum reduction,
  * `smld_loss_fn` / `ddpm_loss_fn` — the discrete legacy objectives
    (descending-sigma NCSN and eps-MSE DDPM),
  * `make_score_train_step` — value_and_grad + optimizer + in-step EMA on
    our `TrainState`, pure and pjit-ready (the gradient all-reduce comes
    from the sharded batch mean; the reference pmaps an explicit lax.pmean,
    losses.py:229,246).

The DDPM-UNet-specific eps-MSE with antithetic times lives in
training/train.py (guided-diffusion parity); this module is the SDE-family
generalization.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dpm_solver_tpu.sde import VESDE, VPSDE, batch_mul
from dpm_solver_tpu.training.train import TrainState, ema_update


def _reduce(values, reduce_mean: bool):
    flat = values.reshape(values.shape[0], -1)
    return jnp.mean(flat, -1) if reduce_mean else 0.5 * jnp.sum(flat, -1)


def sde_loss_fn(
    sde,
    score_fn: Callable,
    *,
    reduce_mean: bool = True,
    likelihood_weighting: bool = False,
    eps: float = 1e-5,
    score_rng: bool = False,
) -> Callable:
    """Returns loss(params, x0, rng) -> scalar; `score_fn(params, x, t)`,
    or `score_fn(params, x, t, rng)` when `score_rng=True` (dropout)."""

    def loss(params, x0, rng):
        rng_t, rng_z, rng_d = jax.random.split(rng, 3)
        t = jax.random.uniform(rng_t, (x0.shape[0],), minval=eps,
                               maxval=sde.T)
        z = jax.random.normal(rng_z, x0.shape, x0.dtype)
        mean, std = sde.marginal_prob(x0, t)
        x_t = mean + batch_mul(std, z)
        score = (score_fn(params, x_t, t, rng_d) if score_rng
                 else score_fn(params, x_t, t))
        if likelihood_weighting:
            g2 = sde.sde(jnp.zeros_like(x0), t)[1] ** 2
            losses = jnp.square(score + batch_mul(1.0 / std, z))
            losses = _reduce(losses, reduce_mean) * g2
        else:
            losses = jnp.square(batch_mul(std, score) + z)
            losses = _reduce(losses, reduce_mean)
        return jnp.mean(losses)

    return loss


def smld_loss_fn(vesde: VESDE, model_fn: Callable, *,
                 reduce_mean: bool = False,
                 model_rng: bool = False) -> Callable:
    """Legacy NCSN objective on descending sigmas (ref losses.py:124-150).
    `model_fn(params, x, labels)` takes discrete labels; with
    ``model_rng=True`` it is called as (params, x, labels, rng) so dropout
    stays live at train time (ref get_step_fn train=True)."""
    assert isinstance(vesde, VESDE)
    sigmas_desc = np.asarray(vesde._sigmas())[::-1].copy()

    def loss(params, x0, rng):
        rng_l, rng_z, rng_d = jax.random.split(rng, 3)
        labels = jax.random.randint(rng_l, (x0.shape[0],), 0, vesde.N)
        sigmas = jnp.asarray(sigmas_desc, x0.dtype)[labels]
        noise = batch_mul(sigmas, jax.random.normal(rng_z, x0.shape, x0.dtype))
        x_t = x0 + noise
        score = (model_fn(params, x_t, labels, rng_d) if model_rng
                 else model_fn(params, x_t, labels))
        target = -batch_mul(1.0 / sigmas ** 2, noise)
        losses = _reduce(jnp.square(score - target), reduce_mean) * sigmas ** 2
        return jnp.mean(losses)

    return loss


def ddpm_loss_fn(vpsde: VPSDE, model_fn: Callable, *,
                 reduce_mean: bool = True,
                 model_rng: bool = False) -> Callable:
    """Legacy DDPM eps-MSE on the discrete beta table (ref losses.py:152-178)."""
    assert isinstance(vpsde, VPSDE)
    ab = np.cumprod(1.0 - np.asarray(vpsde._betas()))
    sqrt_ab = np.sqrt(ab)
    sqrt_1mab = np.sqrt(1.0 - ab)

    def loss(params, x0, rng):
        rng_l, rng_z, rng_d = jax.random.split(rng, 3)
        labels = jax.random.randint(rng_l, (x0.shape[0],), 0, vpsde.N)
        noise = jax.random.normal(rng_z, x0.shape, x0.dtype)
        x_t = (batch_mul(jnp.asarray(sqrt_ab, x0.dtype)[labels], x0)
               + batch_mul(jnp.asarray(sqrt_1mab, x0.dtype)[labels], noise))
        out = (model_fn(params, x_t, labels, rng_d) if model_rng
               else model_fn(params, x_t, labels))
        return jnp.mean(_reduce(jnp.square(out - noise), reduce_mean))

    return loss


def make_score_train_step(loss_fn: Callable, tx) -> Callable:
    """step(state, x0, rng) -> (state, metrics); jit/pjit it at the call site
    with the batch sharded over the mesh's data axis."""

    def step(state: TrainState, x0, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x0, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, state.ema_rate),
            ema_rate=state.ema_rate,
        )
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return step


def make_eval_loss_step(loss_fn: Callable) -> Callable:
    """eval_step(state, x0, rng) -> loss on EMA params (ref run_lib eval)."""

    def step(state: TrainState, x0, rng):
        return loss_fn(state.ema_params, x0, rng)

    return step
