"""First-stage (autoencoder) losses: LPIPS + patch-GAN, TPU-native.

Behavioral twin of the reference's first-stage training losses:
  * `LPIPSWithDiscriminator` — examples/stable-diffusion/ldm/modules/losses/
    contperceptual.py:7-110 (KL autoencoders: L1 + LPIPS + learned-logvar
    NLL + KL + adversarial term with adaptive weight),
  * `VQLPIPSWithDiscriminator` — .../losses/vqperceptual.py:43-167 (VQ
    models: pixel + LPIPS + codebook + adversarial),
  * helpers `adopt_weight` / `hinge_d_loss` / `vanilla_d_loss` /
    `hinge_d_loss_with_exemplar_weights` / `measure_perplexity`
    (vqperceptual.py:11-40 and the taming originals they re-export).

JAX redesign: the torch classes are stateful nn.Modules that own the
discriminator and branch on `optimizer_idx`; here each loss is a pure
function over explicit params, and the adaptive discriminator weight —
`torch.autograd.grad(nll, last_layer)` vs `grad(g_loss, last_layer)`,
contperceptual.py:32-43 — is computed with two `jax.grad` calls through the
decoder's final conv only (`adaptive_gan_weight`): the decoder trunk
activations are closed over, so each grad is a single conv backward, not a
full model backward. `global_step` thresholds (`adopt_weight`) use
`jnp.where` so steps stay traced and the train step compiles once.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """weight if global_step >= threshold else value (vqperceptual.py:20-23),
    traced-step safe."""
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def hinge_d_loss_with_exemplar_weights(logits_real, logits_fake, weights):
    """Per-exemplar weighted hinge loss (vqperceptual.py:11-18)."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real), axis=(1, 2, 3))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake), axis=(1, 2, 3))
    wsum = jnp.sum(weights)
    return 0.5 * (jnp.sum(weights * loss_real) / wsum
                  + jnp.sum(weights * loss_fake) / wsum)


def measure_perplexity(predicted_indices, n_embed):
    """Codebook usage perplexity + cluster count (vqperceptual.py:26-33)."""
    onehot = jax.nn.one_hot(predicted_indices.reshape(-1), n_embed)
    avg_probs = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


def l1(x, y):
    return jnp.abs(x - y)


def l2(x, y):
    return jnp.square(x - y)


def adaptive_gan_weight(last_layer_fn: Callable, last_layer_params,
                        nll_of: Callable, g_of: Callable,
                        disc_weight: float = 1.0):
    """`calculate_adaptive_weight` twin (contperceptual.py:32-43).

    ||d nll / d w_last|| / (||d g / d w_last|| + 1e-4), clipped to [0, 1e4],
    stop-gradiented, scaled by `disc_weight`.

    Args:
      last_layer_fn: w_last -> reconstructions (decoder epilogue closed over
        the trunk activations).
      nll_of / g_of: reconstructions -> scalar.
    """
    def _norm(tree):
        return jnp.sqrt(sum(jnp.sum(jnp.square(g))
                            for g in jax.tree_util.tree_leaves(tree)))

    nll_grads = jax.grad(lambda w: nll_of(last_layer_fn(w)))(last_layer_params)
    g_grads = jax.grad(lambda w: g_of(last_layer_fn(w)))(last_layer_params)
    d_weight = _norm(nll_grads) / (_norm(g_grads) + 1e-4)
    d_weight = jnp.clip(d_weight, 0.0, 1e4)
    return jax.lax.stop_gradient(d_weight) * disc_weight


class GeneratorLossOut(NamedTuple):
    loss: jnp.ndarray
    log: dict


class KLLossConfig(NamedTuple):
    """LPIPSWithDiscriminator hyperparameters (contperceptual.py:8-30)."""
    disc_start: int = 0
    kl_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"  # 'hinge' | 'vanilla'


class VQLossConfig(NamedTuple):
    """VQLPIPSWithDiscriminator hyperparameters (vqperceptual.py:44-83)."""
    disc_start: int = 0
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"
    pixel_loss: str = "l1"  # 'l1' | 'l2'


def _d_loss_fn(kind: str):
    if kind == "hinge":
        return hinge_d_loss
    if kind == "vanilla":
        return vanilla_d_loss
    raise ValueError(f"unknown disc_loss {kind!r}")


def kl_generator_loss(cfg: KLLossConfig, perceptual_fn: Callable,
                      disc_fn: Callable, inputs, reconstructions,
                      posterior, logvar, global_step, *,
                      last_layer_fn: Optional[Callable] = None,
                      last_layer_params: Any = None,
                      weights=None) -> GeneratorLossOut:
    """Optimizer-idx-0 branch of LPIPSWithDiscriminator.forward
    (contperceptual.py:45-92).

    `logvar` is the learned scalar output-variance parameter (a generator
    param, contperceptual.py:20). `disc_fn` maps images -> patch logits
    (conditional discriminators concatenate cond on channels before calling).
    """
    rec_loss = jnp.abs(inputs - reconstructions)
    if cfg.perceptual_weight > 0:
        p_loss = perceptual_fn(inputs, reconstructions)
        rec_loss = rec_loss + cfg.perceptual_weight * p_loss
    nll_loss = rec_loss / jnp.exp(logvar) + logvar
    weighted_nll = nll_loss if weights is None else weights * nll_loss
    # torch sums all dims then divides by batch (contperceptual.py:57-58)
    batch = inputs.shape[0]
    weighted_nll = jnp.sum(weighted_nll) / batch
    nll_scalar = jnp.sum(nll_loss) / batch
    kl_loss = jnp.sum(posterior.kl()) / batch

    logits_fake = disc_fn(reconstructions)
    g_loss = -jnp.mean(logits_fake)

    if cfg.disc_factor > 0.0 and last_layer_fn is not None:
        def nll_of(rec):
            r = jnp.abs(inputs - rec)
            if cfg.perceptual_weight > 0:
                r = r + cfg.perceptual_weight * perceptual_fn(inputs, rec)
            r = r / jnp.exp(logvar) + logvar
            return jnp.sum(r) / batch

        d_weight = adaptive_gan_weight(
            last_layer_fn, last_layer_params, nll_of,
            lambda rec: -jnp.mean(disc_fn(rec)), cfg.disc_weight)
    else:
        d_weight = jnp.float32(0.0)

    disc_factor = adopt_weight(cfg.disc_factor, global_step,
                               threshold=cfg.disc_start)
    loss = weighted_nll + cfg.kl_weight * kl_loss \
        + d_weight * disc_factor * g_loss
    log = {"total_loss": loss, "logvar": logvar, "kl_loss": kl_loss,
           "nll_loss": nll_scalar, "rec_loss": jnp.mean(rec_loss),
           "d_weight": d_weight, "disc_factor": disc_factor,
           "g_loss": g_loss}
    return GeneratorLossOut(loss, log)


def vq_generator_loss(cfg: VQLossConfig, perceptual_fn: Callable,
                      disc_fn: Callable, codebook_loss, inputs,
                      reconstructions, global_step, *,
                      last_layer_fn: Optional[Callable] = None,
                      last_layer_params: Any = None,
                      predicted_indices=None,
                      n_embed: Optional[int] = None) -> GeneratorLossOut:
    """Optimizer-idx-0 branch of VQLPIPSWithDiscriminator.forward
    (vqperceptual.py:98-149)."""
    pixel = l1 if cfg.pixel_loss == "l1" else l2
    rec_loss = pixel(inputs, reconstructions)
    if cfg.perceptual_weight > 0:
        p_loss = perceptual_fn(inputs, reconstructions)
        rec_loss = rec_loss + cfg.perceptual_weight * p_loss
    else:
        p_loss = jnp.float32(0.0)
    nll_loss = jnp.mean(rec_loss)

    logits_fake = disc_fn(reconstructions)
    g_loss = -jnp.mean(logits_fake)

    if last_layer_fn is not None:
        def nll_of(rec):
            r = pixel(inputs, rec)
            if cfg.perceptual_weight > 0:
                r = r + cfg.perceptual_weight * perceptual_fn(inputs, rec)
            return jnp.mean(r)

        d_weight = adaptive_gan_weight(
            last_layer_fn, last_layer_params, nll_of,
            lambda rec: -jnp.mean(disc_fn(rec)), cfg.disc_weight)
    else:
        d_weight = jnp.float32(0.0)

    disc_factor = adopt_weight(cfg.disc_factor, global_step,
                               threshold=cfg.disc_start)
    loss = nll_loss + d_weight * disc_factor * g_loss \
        + cfg.codebook_weight * jnp.mean(codebook_loss)
    log = {"total_loss": loss, "quant_loss": jnp.mean(codebook_loss),
           "nll_loss": nll_loss, "rec_loss": jnp.mean(rec_loss),
           "p_loss": jnp.mean(p_loss), "d_weight": d_weight,
           "disc_factor": disc_factor, "g_loss": g_loss}
    if predicted_indices is not None:
        assert n_embed is not None
        perplexity, cluster_use = measure_perplexity(predicted_indices,
                                                     n_embed)
        log["perplexity"] = perplexity
        log["cluster_usage"] = cluster_use
    return GeneratorLossOut(loss, log)


def discriminator_loss(cfg, disc_fn: Callable, inputs, reconstructions,
                       global_step) -> GeneratorLossOut:
    """Optimizer-idx-1 branch, shared by both losses
    (contperceptual.py:94-110, vqperceptual.py:151-167). Inputs and
    reconstructions must already be stop-gradiented by the caller's
    structure (they are constants w.r.t. disc params here anyway)."""
    logits_real = disc_fn(jax.lax.stop_gradient(inputs))
    logits_fake = disc_fn(jax.lax.stop_gradient(reconstructions))
    disc_factor = adopt_weight(cfg.disc_factor, global_step,
                               threshold=cfg.disc_start)
    d_loss = disc_factor * _d_loss_fn(cfg.disc_loss)(logits_real, logits_fake)
    log = {"disc_loss": d_loss, "logits_real": jnp.mean(logits_real),
           "logits_fake": jnp.mean(logits_fake)}
    return GeneratorLossOut(d_loss, log)
