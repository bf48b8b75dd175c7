"""Training loop building blocks: DDPM eps-MSE loss, optimizer state, EMA.

TPU-native equivalent of the reference training paths:
  * eps-prediction MSE with antithetic time sampling
    (ddpm_and_guided-diffusion/functions/losses.py:4-20 +
     runners/diffusion.py:208-213)
  * in-step EMA of parameters (models/ema.py:4-49; score_sde_jax
    losses.py:231-234)
  * optimizer = Adam with warmup + global-norm clipping
    (score_sde_jax/losses.py:28-62)

The step function is pure and meant to be jitted with the batch sharded over
the mesh's data axis and params replicated: gradient all-reduce is inserted
by XLA from the sharded mean (no explicit pmean — single-controller pjit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dpm_solver_tpu.schedule import NoiseScheduleVP


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    ema_rate: float = dataclasses.field(metadata=dict(static=True), default=0.9999)


def make_optimizer(lr: float = 2e-4, warmup: int = 5000, grad_clip: float = 1.0):
    sched = optax.linear_schedule(0.0, lr, warmup) if warmup else lr
    return optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(sched))


def make_train_state(params, *, lr: float = 2e-4, warmup: int = 5000,
                     grad_clip: float = 1.0, ema_rate: float = 0.9999,
                     tx=None) -> Tuple[TrainState, Any]:
    tx = make_optimizer(lr, warmup, grad_clip) if tx is None else tx
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # distinct buffers: ema aliasing params would make the state
        # un-donatable (double-donation of one buffer)
        ema_params=jax.tree.map(lambda a: jnp.array(a, copy=True), params),
        ema_rate=ema_rate,
    ), tx


def ema_update(ema, new, rate):
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate), ema, new)


def antithetic_times(rng, batch: int, num_timesteps: int):
    """t ~ U{0..T-1} with antithetic pairing t, T-1-t (variance reduction used
    by the reference runner)."""
    t_half = jax.random.randint(rng, ((batch + 1) // 2,), 0, num_timesteps)
    t = jnp.concatenate([t_half, num_timesteps - 1 - t_half])[:batch]
    return t


def make_train_step(
    apply_fn: Callable,
    ns: NoiseScheduleVP,
    tx,
    *,
    num_timesteps: int = 1000,
    loss_type: str = "simple",
    dropout_rng: bool = False,
) -> Callable:
    """Returns step(state, batch_x0, rng) -> (state, metrics).

    `apply_fn(params, x, t_discrete_float)` is the eps-prediction net (e.g.
    DDPMUNet.apply with discrete labels 0..N-1). Loss = E[ sum_px (eps -
    eps_hat)^2 ] matching the reference exactly.

    `dropout_rng=True` changes the contract to
    `apply_fn(params, x, t, rng)` so the net can run its dropout layers
    (the reference trains WITH dropout; run_lib opts in).
    """
    # alpha-bar lookup table for discrete t (fp32, device constant)
    t_grid = (jnp.arange(num_timesteps, dtype=jnp.float32) + 1.0) / num_timesteps
    log_alpha = ns.marginal_log_mean_coeff(t_grid)
    sqrt_ab = jnp.exp(log_alpha)
    sqrt_1mab = jnp.sqrt(-jnp.expm1(2.0 * log_alpha))

    def loss_fn(params, x0, t, eps, rng_d):
        a = sqrt_ab[t][:, None, None, None]
        s = sqrt_1mab[t][:, None, None, None]
        xt = x0 * a + eps * s
        t_f = t.astype(jnp.float32)
        out = (apply_fn(params, xt, t_f, rng_d) if dropout_rng
               else apply_fn(params, xt, t_f))
        return jnp.mean(jnp.sum(jnp.square(eps - out), axis=(1, 2, 3)))

    def step(state: TrainState, x0, rng):
        rng_t, rng_e, rng_d = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        t = antithetic_times(rng_t, x0.shape[0], num_timesteps)
        eps = jax.random.normal(rng_e, x0.shape, x0.dtype)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x0, t, eps,
                                                  rng_d)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, state.ema_rate),
            ema_rate=state.ema_rate,
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def make_multi_step(step_fn: Callable, n_steps: int) -> Callable:
    """Fuse `n_steps` train steps into one compiled program via lax.scan —
    the reference's n_jitted_steps trick (score_sde_jax/run_lib.py:124:
    pmap(partial(lax.scan, train_step))). Amortizes dispatch overhead and
    lets XLA overlap the optimizer with the next step's forward.

    Returns multi_step(state, batches, rng) -> (state, metrics) where
    `batches` has a leading [n_steps] axis and metrics are the per-step
    scans stacked."""

    def multi_step(state, batches, rng):
        def body(carry, batch):
            state = carry
            state, metrics = step_fn(state, batch, rng)
            return state, metrics

        return jax.lax.scan(body, state, batches)

    return multi_step
