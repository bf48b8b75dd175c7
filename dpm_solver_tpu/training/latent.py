"""Latent-diffusion training: the p_losses objective over a frozen first
stage, TPU-native.

Twin of the reference LDM training semantics
(examples/stable-diffusion/ldm/models/diffusion/ddpm.py):
  * q_sample + eps / x0 target MSE (``DDPM.p_losses``, ddpm.py:294-320;
    ``LatentDiffusion.p_losses`` adds conditioning via ``apply_model``);
    the ``v`` target of the SD-2.x lineage is included since our sampler
    and converters already speak v-prediction.
  * frozen VAE encode with the LDM scale factor
    (``LatentDiffusion.encode_first_stage``, ddpm.py:706) and frozen text
    conditioning (``cond_stage_trainable: false`` in the SD configs) — only
    the UNet trains.
  * per-sample mean-square over latent dims, meaned over the batch
    (``get_loss(mean=True)`` + ``loss_simple`` with the default zero
    logvar / zero ELBO weights, ddpm.py:330-345).

What is deliberately NOT carried over: the PyTorch-Lightning harness, GAN /
LPIPS first-stage losses, BSRGAN degradations (SURVEY.md §7 — first-stage
training is out of scope; the first stage here is always frozen).

The step is a pure function: jit it with the batch sharded over the mesh's
data axis and params replicated; XLA inserts the gradient all-reduce.
Frozen (VAE) params are step ARGUMENTS, not closure constants, so they are
not baked into the HLO.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dpm_solver_tpu.training.train import TrainState, ema_update


def make_latent_train_step(
    unet_apply: Callable,
    tx,
    betas: np.ndarray,
    *,
    encode_fn: Optional[Callable] = None,
    parameterization: str = "eps",
    cond_dropout: float = 0.0,
    uncond_context: Optional[jnp.ndarray] = None,
) -> Callable:
    """Build step(state, frozen_params, images, context, rng) -> (state, metrics).

    Args:
      unet_apply: (params, z_t, t_float, context) -> prediction (the
        conditional UNet; t is a discrete label 0..N-1 as float, matching
        ``LatentDiffusion.apply_model``).
      tx: optax transform (pair with ``make_train_state``'s TrainState).
      betas: LDM beta schedule (``make_ldm_betas()``).
      encode_fn: (frozen_params, images, rng) -> scaled latents z0. None
        means the batch already holds latents (pre-encoded datasets).
      parameterization: 'eps' | 'x0' | 'v' (ddpm.py parameterization +
        the v-objective: v = sqrt(ab)*eps - sqrt(1-ab)*x0).
      cond_dropout: probability of replacing a sample's context with
        ``uncond_context`` — the classifier-free-guidance training
        convention (Ho & Salimans 2022) the SD checkpoints were trained
        with.
    """
    if parameterization not in ("eps", "x0", "v"):
        raise ValueError(f"unknown parameterization {parameterization!r}")
    if cond_dropout and uncond_context is None:
        raise ValueError("cond_dropout needs an uncond_context")

    alphas_cumprod = np.cumprod(1.0 - np.asarray(betas, np.float64))
    n_t = len(alphas_cumprod)
    sqrt_ab = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
    sqrt_1mab = jnp.asarray(np.sqrt(1.0 - alphas_cumprod), jnp.float32)

    def loss_fn(params, z0, context, t, eps):
        a = sqrt_ab[t][:, None, None, None]
        s = sqrt_1mab[t][:, None, None, None]
        z_t = a * z0 + s * eps
        out = unet_apply(params, z_t, t.astype(jnp.float32), context)
        if parameterization == "eps":
            target = eps
        elif parameterization == "x0":
            target = z0
        else:  # v-objective (Salimans & Ho 2022)
            target = a * eps - s * z0
        # loss_simple: per-sample mean over dims, then batch mean
        return jnp.mean(jnp.square(out - target), axis=(1, 2, 3)).mean()

    def step(state: TrainState, frozen_params, images, context, rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_t, rng_e, rng_z, rng_c = jax.random.split(rng, 4)
        z0 = (images if encode_fn is None
              else encode_fn(frozen_params, images, rng_z))
        b = z0.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, n_t)
        eps = jax.random.normal(rng_e, z0.shape, z0.dtype)
        if cond_dropout:
            drop = jax.random.bernoulli(rng_c, cond_dropout, (b,))
            uc = jnp.broadcast_to(jnp.asarray(uncond_context, context.dtype),
                                  context.shape)
            context = jnp.where(drop[:, None, None], uc, context)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z0, context,
                                                  t, eps)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, state.ema_rate),
            ema_rate=state.ema_rate)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return step


def vae_encode_fn(vae, *, scale_factor: float = 0.18215,
                  sample: bool = True) -> Callable:
    """(vae_params, images, rng) -> scaled latents, for make_latent_train_step.

    Matches ``LatentDiffusion.encode_first_stage`` + ``get_first_stage_
    encoding`` (ddpm.py:706,830-841): posterior SAMPLE (not mode) during
    training, times scale_factor."""
    from dpm_solver_tpu.models.vae import AutoencoderKL

    def encode(vae_params, images, rng):
        posterior = vae.apply(vae_params, images, method=AutoencoderKL.encode)
        z = posterior.sample(rng) if sample else posterior.mode()
        return scale_factor * jax.lax.stop_gradient(z)

    return encode
