"""First-stage (AutoencoderKL / VQModel) adversarial training, TPU-native.

Twin of the reference's autoencoder training semantics — the
PyTorch-Lightning two-optimizer loop of
examples/stable-diffusion/ldm/models/autoencoder.py (`training_step`
branches on optimizer_idx; `configure_optimizers` builds one Adam for
encoder+decoder+logvar and one for the discriminator, equal lr, betas
(0.5, 0.9)) driving the losses of
ldm/modules/losses/{contperceptual,vqperceptual}.py.

JAX redesign: one jitted pure step per batch that runs BOTH optimizer
passes (PL calls training_step once per optimizer per batch). The
reconstruction forward runs once; the discriminator pass sees it through
`stop_gradient`. The adaptive GAN weight gets its two single-conv backward
passes by splitting the decoder at its final conv: the trunk activations
are computed inside the loss closure and the epilogue conv re-applied as a
function of the last-layer kernel (training/perceptual.adaptive_gan_weight).

Everything shards data-parallel: jit with the batch sharded over the mesh
data axis, params replicated; XLA inserts the gradient all-reduces. bf16 is
safe for the conv trunks; losses, norms and the KL run fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from dpm_solver_tpu.training import perceptual as P


@flax.struct.dataclass
class AdversarialTrainState:
    """Generator (autoencoder + logvar) and discriminator optimization
    state. `gen_params` holds {'ae': <autoencoder params>, 'logvar': scalar}
    (logvar only used by the KL loss)."""
    step: jax.Array
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_batch_stats: Any
    disc_opt: Any


def make_adversarial_state(ae_params, disc_vars, *, lr: float = 4.5e-6,
                           logvar_init: float = 0.0,
                           tx: Optional[optax.GradientTransformation] = None,
                           ) -> Tuple[AdversarialTrainState,
                                      optax.GradientTransformation]:
    """Mirror of `AutoencoderKL.configure_optimizers`: two Adams with the
    same lr, betas (0.5, 0.9)."""
    if tx is None:
        tx = optax.adam(lr, b1=0.5, b2=0.9)
    gen_params = {"ae": ae_params, "logvar": jnp.float32(logvar_init)}
    disc_params = disc_vars["params"]
    state = AdversarialTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=tx.init(gen_params),
        disc_params=disc_params,
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        disc_opt=tx.init(disc_params),
    )
    return state, tx


def _disc_update(cfg, disc_apply, tx, state: AdversarialTrainState,
                 images, recon):
    """Optimizer-1 pass shared by the KL and VQ steps."""

    def d_loss_fn(dparams):
        # torch runs the real batch then the fake batch through the same
        # BatchNorm layers, updating the running moments twice in sequence
        # (contperceptual.py:94-104); thread the stats through both calls
        stats_box = {"stats": state.disc_batch_stats}

        def disc_fn(x):
            dvars = {"params": dparams, "batch_stats": stats_box["stats"]}
            logits, new_stats = disc_apply(dvars, x)
            stats_box["stats"] = jax.lax.stop_gradient(new_stats)
            return logits

        out = P.discriminator_loss(cfg, disc_fn, images, recon, state.step)
        return out.loss, (stats_box["stats"], out.log)

    (_, (new_stats, dlog)), dgrads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.disc_params)
    dupd, disc_opt = tx.update(dgrads, state.disc_opt, state.disc_params)
    disc_params = optax.apply_updates(state.disc_params, dupd)
    return disc_params, new_stats, disc_opt, dlog


def _finish(state, gen_params, gen_opt, disc_params, new_stats, disc_opt,
            glog, dlog):
    new_state = AdversarialTrainState(
        step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt,
        disc_params=disc_params, disc_batch_stats=new_stats,
        disc_opt=disc_opt)
    logs = {f"train/{k}": v for k, v in {**glog, **dlog}.items()}
    return new_state, logs


def make_kl_train_step(cfg: P.KLLossConfig, *,
                       encode_decode: Callable,
                       epilogue: Callable,
                       last_layer_of: Callable,
                       perceptual_fn: Callable,
                       disc_apply: Callable,
                       tx: optax.GradientTransformation,
                       sample_posterior: bool = True) -> Callable:
    """Build step(state, images, rng, perceptual_params) -> (state, logs).

    Args:
      encode_decode: (ae_params, images, rng, sample_posterior) ->
        (trunk_h, posterior) where trunk_h is the decoder's pre-final-conv
        activation map.
      epilogue: (ae_params, last_layer_kernel, trunk_h) -> reconstructions
        (kernel passed explicitly so the adaptive weight can differentiate
        w.r.t. it alone — torch's `last_layer=decoder.conv_out.weight`,
        autoencoder.py — while the bias keeps training via ae_params).
      last_layer_of: ae_params -> last-layer kernel array.
      perceptual_fn: (lpips_params, x, y) -> (B,1,1,1) LPIPS distance.
      disc_apply: ({'params':..., 'batch_stats':...}, images) ->
        (patch_logits, new_batch_stats).
    """

    def step_fn(state: AdversarialTrainState, images, rng,
                perceptual_params):
        pfn = lambda x, y: perceptual_fn(perceptual_params, x, y)  # noqa: E731
        disc_vars = {"params": state.disc_params,
                     "batch_stats": state.disc_batch_stats}

        def disc_fn(x):
            logits, _ = disc_apply(disc_vars, x)  # gen pass: stats frozen
            return logits

        def gen_loss_fn(gen_params):
            h, posterior = encode_decode(gen_params["ae"], images, rng,
                                         sample_posterior)
            w_last = last_layer_of(gen_params["ae"])
            recon = epilogue(gen_params["ae"], w_last, h)
            frozen = jax.lax.stop_gradient((gen_params["ae"], h))
            out = P.kl_generator_loss(
                cfg, pfn, disc_fn, images, recon, posterior,
                gen_params["logvar"], state.step,
                last_layer_fn=lambda w: epilogue(frozen[0], w, frozen[1]),
                last_layer_params=w_last)
            return out.loss, (recon, out.log)

        (_, (recon, glog)), ggrads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gupd, gen_opt = tx.update(ggrads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gupd)

        disc_params, new_stats, disc_opt, dlog = _disc_update(
            cfg, disc_apply, tx, state, images,
            jax.lax.stop_gradient(recon))
        return _finish(state, gen_params, gen_opt, disc_params, new_stats,
                       disc_opt, glog, dlog)

    return step_fn


def bind_autoencoder(model, discriminator, lpips):
    """Bind model instances to the callables the step builders expect.

    `model` is an AutoencoderKL or VQModel (models/vae.py), `discriminator`
    an NLayerDiscriminator, `lpips` an LPIPS module. Returns a dict of
    kwargs for make_kl_train_step / make_vq_train_step (minus cfg/tx).
    """
    from dpm_solver_tpu.models import vae as vae_mod
    from dpm_solver_tpu.models.vae import AutoencoderKL

    tanh_out = model.config.tanh_out
    is_kl = isinstance(model, AutoencoderKL)

    if is_kl:
        def encode_decode(ae_params, images, rng, sample_posterior):
            return model.apply({"params": ae_params}, images, rng,
                               sample_posterior=sample_posterior,
                               method=model.forward_trunk)
    else:
        def encode_decode(ae_params, images):
            return model.apply({"params": ae_params}, images,
                               method=model.forward_trunk)

    def epilogue(ae_params, kernel, h):
        conv_out = dict(ae_params["decoder"]["conv_out"], kernel=kernel)
        return vae_mod.decoder_epilogue(conv_out, h, tanh_out=tanh_out,
                                        dtype=model.dtype)

    def last_layer_of(ae_params):
        return ae_params["decoder"]["conv_out"]["kernel"]

    def perceptual_fn(lpips_params, x, y):
        return lpips.apply(lpips_params, x, y)

    def disc_apply(disc_vars, x):
        logits, updates = discriminator.apply(disc_vars, x,
                                              mutable=["batch_stats"])
        return logits, updates.get("batch_stats", {})

    return dict(encode_decode=encode_decode, epilogue=epilogue,
                last_layer_of=last_layer_of, perceptual_fn=perceptual_fn,
                disc_apply=disc_apply)


def make_vq_train_step(cfg: P.VQLossConfig, *,
                       encode_decode: Callable,
                       epilogue: Callable,
                       last_layer_of: Callable,
                       perceptual_fn: Callable,
                       disc_apply: Callable,
                       tx: optax.GradientTransformation,
                       n_embed: Optional[int] = None) -> Callable:
    """VQ twin: encode_decode(ae_params, images) ->
    (trunk_h, codebook_loss, indices)."""

    def step_fn(state: AdversarialTrainState, images, rng,
                perceptual_params):
        del rng  # VQ forward is deterministic
        pfn = lambda x, y: perceptual_fn(perceptual_params, x, y)  # noqa: E731
        disc_vars = {"params": state.disc_params,
                     "batch_stats": state.disc_batch_stats}

        def disc_fn(x):
            logits, _ = disc_apply(disc_vars, x)
            return logits

        def gen_loss_fn(gen_params):
            h, qloss, idx = encode_decode(gen_params["ae"], images)
            w_last = last_layer_of(gen_params["ae"])
            recon = epilogue(gen_params["ae"], w_last, h)
            frozen = jax.lax.stop_gradient((gen_params["ae"], h))
            out = P.vq_generator_loss(
                cfg, pfn, disc_fn, qloss, images, recon, state.step,
                last_layer_fn=lambda w: epilogue(frozen[0], w, frozen[1]),
                last_layer_params=w_last,
                predicted_indices=idx if n_embed else None,
                n_embed=n_embed)
            return out.loss, (recon, out.log)

        (_, (recon, glog)), ggrads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gupd, gen_opt = tx.update(ggrads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gupd)

        disc_params, new_stats, disc_opt, dlog = _disc_update(
            cfg, disc_apply, tx, state, images,
            jax.lax.stop_gradient(recon))
        return _finish(state, gen_params, gen_opt, disc_params, new_stats,
                       disc_opt, glog, dlog)

    return step_fn
