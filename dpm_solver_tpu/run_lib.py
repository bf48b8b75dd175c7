"""Training / evaluation orchestration (the reference's run_lib layer).

TPU-native twin of examples/score_sde_jax/run_lib.py:51-595 and the
guided-diffusion runner's FID loop (runners/diffusion.py:407-457):

  * `train` — preemption-safe training: restore-or-init, jitted multi-step
    train program over a pjit mesh (batch sharded, params replicated), meta
    checkpoints at `snapshot_freq_for_preemption`, full snapshots + sample
    grids at `snapshot_freq`.
  * `evaluate` — checkpoint-polling eval: per-checkpoint loss / bits-per-dim
    / sampling rounds with `EvalMeta` resume, features -> FID/IS/KID when a
    stats file + inception weights are supplied.

Multi-host deltas vs the reference: single-controller pjit over one Mesh
(the reference pmaps + folds rng by host, run_lib.py:124-144) and
`multihost_utils.process_allgather` for metric aggregation instead of
GCS file barriers (:564-568).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.configs import Config
from dpm_solver_tpu.training.checkpoints import (
    CheckpointManager,
    EvalMeta,
    delete_eval_meta,
    load_eval_meta,
    restore_or_init,
    save_eval_meta,
)
from dpm_solver_tpu.training.train import TrainState, make_optimizer, make_train_state

log = logging.getLogger("dpm_solver_tpu")


def build_model(config: Config):
    """Config -> (flax module, init_fn(rng) -> params)."""
    from dpm_solver_tpu import models

    family = config.model_family
    mc = config.model_config
    d = config.data
    if family == "ddpm_unet":
        model = models.DDPMUNet(mc)
    elif family == "ncsnpp":
        model = models.NCSNpp(config=mc)
    elif family == "ncsnv2":
        model = models.NCSNv2(config=mc)
    elif family in ("adm", "sd"):
        model = models.ADMUNet(config=mc)
    else:
        raise ValueError(f"unknown model family {family!r}")

    def init_fn(rng):
        x = jnp.zeros((1, d.image_size, d.image_size,
                       getattr(mc, "in_channels", d.channels)))
        t = jnp.ones((1,))
        if family in ("adm", "sd"):
            y = (jnp.zeros((1,), jnp.int32)
                 if getattr(mc, "num_classes", None) else None)
            # cross-attention params take their shapes from the context:
            # init with a CLIP-shaped dummy or to_k/to_v would be built
            # against the query stream
            ctx = (jnp.zeros((1, 77, mc.context_dim))
                   if getattr(mc, "use_spatial_transformer", False) else None)
            return jax.jit(lambda r: model.init(
                r, x, t, y, ctx, deterministic=True))(rng)
        if family == "ddpm_unet":
            return jax.jit(lambda r: model.init(r, x, t))(rng)
        if family == "ncsnv2":
            labels = jnp.zeros((1,), jnp.int32)
            return jax.jit(lambda r: model.init(r, x, labels))(rng)
        return jax.jit(lambda r: model.init(r, x, t, deterministic=True))(rng)

    return model, init_fn


def score_net_apply(model, family: str, *, train: bool = False):
    """Shared label-convention dispatch for discretely-labelled score nets
    (used by train/eval/PC sampling): NCSNv2/NCSN take int32 sigma-ladder
    indices; NCSN++ and DDPM UNets take float labels. ``train=True`` keeps
    dropout live (callers pass an rng as the 4th argument)."""

    def apply_fn(params, x, labels, rng=None):
        if family == "ncsnv2":
            return model.apply(params, x, labels.astype(jnp.int32))
        labels = labels.astype(jnp.float32)
        if family == "ddpm_unet":
            if train:
                return model.apply(params, x, labels,
                                   rngs={"dropout": rng}, deterministic=False)
            return model.apply(params, x, labels)
        if train:
            return model.apply(params, x, labels, deterministic=False,
                               rngs={"dropout": rng})
        return model.apply(params, x, labels, deterministic=True)

    return apply_fn


def uses_legacy_discrete_loss(config: Config) -> bool:
    """Discretely-labelled score nets train/eval with the legacy SMLD /
    DDPM objectives (ref losses.py:124-178) instead of the continuous
    score-matching loss or the ddpm-example's eps-MSE."""
    if config.training.continuous:
        return False
    return (config.model_family in ("ncsnpp", "ncsnv2")
            or (config.model_family == "ddpm_unet"
                and config.training.sde == "vesde"))


def legacy_loss_fn(config: Config, model, *, train: bool = False):
    """The SMLD/legacy-DDPM loss for a `uses_legacy_discrete_loss` config,
    with the family's label convention and (when training) live dropout."""
    from dpm_solver_tpu.training.losses import ddpm_loss_fn, smld_loss_fn

    if config.training.sde == "subvpsde":
        # mirrors the reference: sub-VP has no discrete objective
        # (losses.py get_step_fn raises for discrete subVP)
        raise ValueError("discrete training is undefined for the sub-VP SDE")
    sde = _make_sde(config)
    apply_fn = score_net_apply(model, config.model_family, train=train)
    make = smld_loss_fn if config.training.sde == "vesde" else ddpm_loss_fn
    return make(sde, apply_fn, reduce_mean=config.training.reduce_mean,
                model_rng=train)


def _make_sde(config: Config):
    from dpm_solver_tpu.sde import SubVPSDE, VESDE, VPSDE

    t = config.training
    if t.sde == "vesde":
        return VESDE(sigma_min=t.sigma_min, sigma_max=t.sigma_max,
                     N=t.num_scales)
    cls = {"vpsde": VPSDE, "subvpsde": SubVPSDE}[t.sde]
    return cls(beta_0=t.beta_min, beta_1=t.beta_max, N=t.num_scales)


def train(config: Config, data_iter: Iterator[np.ndarray], *,
          workdir: Optional[str] = None,
          max_steps: Optional[int] = None) -> TrainState:
    """Preemption-safe training loop (ref run_lib.py:51-214). `data_iter`
    yields [devices, per_device, H, W, C] or [B, H, W, C] numpy batches in
    model space."""
    workdir = workdir or config.workdir
    tcfg = config.training
    model, init_fn = build_model(config)

    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    params = init_fn(init_rng)
    tx = make_optimizer(tcfg.lr, tcfg.warmup, tcfg.grad_clip)
    state, _ = make_train_state(params, ema_rate=tcfg.ema_rate, tx=tx)

    ckpts = CheckpointManager(os.path.join(workdir, "checkpoints"),
                              max_to_keep=5)
    meta = CheckpointManager(os.path.join(workdir, "checkpoints-meta"),
                             max_to_keep=1)
    state = restore_or_init(meta, state)
    start = int(state.step)
    log.info("training from step %d", start)

    if tcfg.continuous:
        from dpm_solver_tpu.score import get_score_fn
        from dpm_solver_tpu.training.losses import (
            make_score_train_step,
            sde_loss_fn,
        )

        sde = _make_sde(config)
        score_fn = lambda p, x, t, rng: get_score_fn(
            sde, lambda xx, tt: model.apply(
                p, xx, tt, deterministic=False, rngs={"dropout": rng}),
            continuous=True)(x, t)
        loss_fn = sde_loss_fn(sde, score_fn, reduce_mean=tcfg.reduce_mean,
                              likelihood_weighting=tcfg.likelihood_weighting,
                              score_rng=True)
        step_fn = make_score_train_step(loss_fn, tx)
    elif uses_legacy_discrete_loss(config):
        from dpm_solver_tpu.training.losses import make_score_train_step

        step_fn = make_score_train_step(
            legacy_loss_fn(config, model, train=True), tx)
    else:
        from dpm_solver_tpu.schedule import NoiseScheduleVP
        from dpm_solver_tpu.training.train import make_train_step

        ns = NoiseScheduleVP.discrete(betas=config.diffusion.betas())
        step_fn = make_train_step(
            lambda p, x, t, rng: model.apply(
                p, x, t, rngs={"dropout": rng}, deterministic=False),
            ns, tx, dropout_rng=True)

    step_fn = jax.jit(step_fn, donate_argnums=0)
    total = max_steps if max_steps is not None else tcfg.n_iters

    for step in range(start, total):
        batch = next(data_iter)
        batch = jnp.asarray(batch).reshape((-1,) + batch.shape[-3:])
        state, metrics = step_fn(state, batch, rng)
        if step % tcfg.log_freq == 0:
            log.info("step %d loss %.5g", step, float(metrics["loss"]))
        if step and step % tcfg.snapshot_freq_for_preemption == 0:
            meta.save(step, state)
        if step and step % tcfg.snapshot_freq == 0:
            ckpts.save(step, state)
    return state


def evaluate(config: Config, *, workdir: Optional[str] = None,
             sample_fn: Optional[Callable] = None,
             feature_fn: Optional[Callable] = None,
             loss_fn: Optional[Callable] = None,
             bpd_fn: Optional[Callable] = None,
             bpd_rounds: int = 0,
             rounds: Optional[int] = None,
             poll_timeout: Optional[float] = 0.0) -> dict:
    """Checkpoint-polling, preemption-resumable evaluation
    (ref run_lib.py:217-595).

    Iterates the SAVED checkpoint steps in [begin_ckpt, end_ckpt] (orbax
    checkpoints are keyed by global training step, not consecutive ids).
    Hooks, all optional:
      sample_fn(state, rng) -> [B,H,W,C]    one sampling round
      feature_fn(images) -> (feats, logits) FID/IS features; per-round
                                            features are PERSISTED so
                                            preemption resume aggregates
                                            over all rounds (ref
                                            statistics_r.npz pattern)
      loss_fn(state, rng) -> float          eval loss (enable_loss)
      bpd_fn(state, rng) -> [B] bits/dim    likelihood rounds (enable_bpd)
    """
    workdir = workdir or config.workdir
    ecfg = config.eval
    eval_dir = os.path.join(workdir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    ckpts = CheckpointManager(os.path.join(workdir, "checkpoints"))

    model, init_fn = build_model(config)
    params = init_fn(jax.random.PRNGKey(0))
    # the optimizer hyperparameters shape the opt_state pytree; the restore
    # template must match what training saved
    tcfg = config.training
    tx = make_optimizer(tcfg.lr, tcfg.warmup, tcfg.grad_clip)
    template, _ = make_train_state(params, ema_rate=tcfg.ema_rate, tx=tx)

    n_rounds = rounds if rounds is not None else int(
        np.ceil(ecfg.num_samples / ecfg.batch_size))
    meta = load_eval_meta(eval_dir)
    results = {}

    from dpm_solver_tpu.training.checkpoints import wait_for_checkpoint

    if not wait_for_checkpoint(ckpts, ecfg.begin_ckpt, poll_seconds=5.0,
                               timeout=poll_timeout):
        log.info("no checkpoint >= %d available", ecfg.begin_ckpt)
        return results
    steps_to_eval = [s for s in ckpts.all_steps()
                     if ecfg.begin_ckpt <= s <= ecfg.end_ckpt
                     and s >= meta.ckpt_id]
    for ckpt_id in steps_to_eval:
        state = ckpts.restore(template, ckpt_id)
        base_rng = jax.random.fold_in(jax.random.PRNGKey(config.seed), ckpt_id)
        entry = {"rounds": n_rounds}

        if loss_fn is not None and ecfg.enable_loss:
            entry["loss"] = float(loss_fn(
                state, jax.random.fold_in(base_rng, 10_000)))

        if bpd_fn is not None and ecfg.enable_bpd:
            start_b = meta.bpd_round_id + 1 if meta.ckpt_id == ckpt_id else 0
            for r in range(start_b, bpd_rounds):
                bpd = np.asarray(bpd_fn(
                    state, jax.random.fold_in(base_rng, 20_000 + r)))
                np.savez(os.path.join(eval_dir,
                                      f"bpd_ckpt{ckpt_id}_round{r}.npz"),
                         bpd=bpd)
                meta = EvalMeta(ckpt_id=ckpt_id, bpd_round_id=r,
                                sampling_round_id=meta.sampling_round_id
                                if meta.ckpt_id == ckpt_id else -1)
                save_eval_meta(meta, eval_dir)
            bpds = [np.load(os.path.join(
                eval_dir, f"bpd_ckpt{ckpt_id}_round{r}.npz"))["bpd"]
                for r in range(bpd_rounds)]
            if bpds:
                entry["bpd"] = float(np.mean(np.concatenate(bpds)))

        if sample_fn is not None:
            start_round = (meta.sampling_round_id + 1
                           if meta.ckpt_id == ckpt_id else 0)
            for r in range(start_round, n_rounds):
                rng = jax.random.fold_in(base_rng, r)
                samples = sample_fn(state, rng)
                if feature_fn is not None:
                    f, l = feature_fn(samples)
                    # persist per round so resume aggregates ALL rounds
                    np.savez(os.path.join(
                        eval_dir, f"stats_ckpt{ckpt_id}_round{r}.npz"),
                        feats=np.asarray(f), logits=np.asarray(l))
                else:
                    np.savez(os.path.join(
                        eval_dir, f"samples_ckpt{ckpt_id}_round{r}.npz"),
                        samples=np.asarray(samples))
                meta = EvalMeta(ckpt_id=ckpt_id, sampling_round_id=r,
                                bpd_round_id=meta.bpd_round_id
                                if meta.ckpt_id == ckpt_id else -1
                                ).with_rng(rng)
                save_eval_meta(meta, eval_dir)

            if feature_fn is not None:
                from dpm_solver_tpu.eval import (
                    fid_from_features,
                    inception_score,
                    load_statistics,
                )

                stats = [np.load(os.path.join(
                    eval_dir, f"stats_ckpt{ckpt_id}_round{r}.npz"))
                    for r in range(n_rounds)]
                feats_all = np.concatenate([s["feats"] for s in stats])
                entry["inception_score"] = inception_score(
                    np.concatenate([s["logits"] for s in stats]))[0]
                if ecfg.fid_stats_path:
                    entry["fid"] = fid_from_features(
                        feats_all, load_statistics(ecfg.fid_stats_path))

        results[ckpt_id] = entry
        meta = EvalMeta(ckpt_id=ckpt_id + 1)
        save_eval_meta(meta, eval_dir)

    delete_eval_meta(eval_dir)
    return results


def train_latent(preset: str, data_iter: Iterator, *,
                 workdir: str,
                 unet_config=None, vae_config=None,
                 init_model=None,
                 parameterization: Optional[str] = None,
                 cond_dropout: float = 0.0,
                 uncond_context: Optional[np.ndarray] = None,
                 lr: float = 1e-4, warmup: int = 0, grad_clip: float = 1.0,
                 ema_rate: float = 0.9999,
                 optimizer: str = "adam", remat: bool = False,
                 max_steps: int = 1000, log_freq: int = 50,
                 snapshot_freq: int = 10_000,
                 snapshot_freq_for_preemption: int = 1_000,
                 seed: int = 0) -> TrainState:
    """Latent-diffusion training loop: frozen first stage, UNet trains.

    The reference trains LDMs through a PyTorch-Lightning harness
    (examples/stable-diffusion/main.py + ldm/models/diffusion/ddpm.py
    ``p_losses``); the TPU-native twin is this plain loop over the jitted
    pure step from ``training/latent.py`` — preemption-safe like ``train``
    (meta checkpoints + restore-or-init), params and frozen VAE weights as
    jit arguments, batch shardable over the mesh's data axis.

    Args:
      preset: LDM geometry/schedule preset (``sd_v1 | sd_v2_1 | cin256 |
        rdm_768`` — pipelines/stable_diffusion._LDM_PRESETS); explicit
        ``unet_config`` / ``vae_config`` override its geometry.
      data_iter: yields image batches [B,H,W,3] in model space ([-1,1]),
        or ``(images, context)`` tuples for conditional training.
      init_model: optional ``LatentDiffusion`` bundle (e.g. from
        ``load_sd_checkpoint``) — fine-tuning flow: its UNet params seed
        the train state and its VAE is the frozen first stage.
      parameterization: eps | x0 | v; None = the preset's convention
        (v for SD-2.x linear-transformer geometry, eps otherwise).
      cond_dropout / uncond_context: classifier-free-guidance training
        (p(drop) and the null context row, broadcast per sample).
      optimizer: 'adam' (the reference's choice, main.py
        ``configure_optimizers``) | 'adafactor' (factored second moment,
        no first moment — the one-chip recipe for full-size SD: Adam's
        fp32 states alone are 2x params and do not fit the 866M UNet on
        16 GiB; see benchmarks/sd_latent_train_bench.py).
      remat: per-block rematerialization in the UNet (the reference's
        use_checkpoint flag) — bounds backward activation memory.
    """
    from dpm_solver_tpu.models.adm_unet import ADMUNet
    from dpm_solver_tpu.models.vae import AutoencoderKL, VQModel
    from dpm_solver_tpu.pipelines.stable_diffusion import (
        _LDM_PRESETS,
        make_ldm_betas,
    )
    from dpm_solver_tpu.training.latent import (
        make_latent_train_step,
        vae_encode_fn,
    )

    if preset not in _LDM_PRESETS:
        raise ValueError(f"unknown preset {preset!r}; "
                         f"one of {sorted(_LDM_PRESETS)}")
    u_default, v_default, beta_kw, scale = _LDM_PRESETS[preset]
    unet_config = unet_config or (init_model.unet.config if init_model
                                  else u_default())
    vae_config = vae_config or (init_model.vae.config if init_model
                                else v_default())
    if parameterization is None:
        parameterization = (init_model.parameterization if init_model
                            else ("v" if unet_config.use_linear_in_transformer
                                  else "eps"))
    if remat and not unet_config.remat:
        import dataclasses

        unet_config = dataclasses.replace(unet_config, remat=True)
    betas = init_model.betas if init_model else make_ldm_betas(1000, **beta_kw)

    rng = jax.random.PRNGKey(seed)
    rng, rng_u, rng_v = jax.random.split(rng, 3)
    unet = ADMUNet(config=unet_config)
    is_vq = (isinstance(init_model.vae, VQModel) if init_model is not None
             else preset == "cin256")
    if init_model is not None:
        vae, vae_params = init_model.vae, init_model.vae_params
        unet_params = init_model.unet_params
    else:
        vae = (VQModel(config=vae_config) if is_vq
               else AutoencoderKL(config=vae_config))
        res = vae_config.resolution
        z = jnp.zeros((1, res, res, vae_config.in_channels))
        vae_params = jax.jit(lambda: vae.init(rng_v, z))()
        f = 2 ** (len(vae_config.ch_mult) - 1)
        zl = jnp.zeros((1, res // f, res // f, unet_config.in_channels))
        ctx = (None if unet_config.context_dim is None else
               jnp.zeros((1, 1, unet_config.context_dim)))
        unet_params = jax.jit(lambda: unet.init(
            rng_u, zl, jnp.zeros((1,)), None, ctx, deterministic=True))()

    if is_vq:
        def encode_fn(vp, images, _rng):
            zq = vae.apply(vp, images, method=VQModel.encode)
            return scale * jax.lax.stop_gradient(zq)
    else:
        encode_fn = vae_encode_fn(vae, scale_factor=scale)

    if optimizer == "adam":
        tx = make_optimizer(lr, warmup, grad_clip)
    elif optimizer == "adafactor":
        import optax

        sched = optax.linear_schedule(0.0, lr, warmup) if warmup else lr
        tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                         optax.adafactor(learning_rate=sched))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}; "
                         "one of ('adam', 'adafactor')")
    state, _ = make_train_state(unet_params, ema_rate=ema_rate, tx=tx)
    ckpts = CheckpointManager(os.path.join(workdir, "checkpoints"),
                              max_to_keep=5)
    meta = CheckpointManager(os.path.join(workdir, "checkpoints-meta"),
                             max_to_keep=1)
    state = restore_or_init(meta, state)
    start = int(state.step)
    log.info("latent training (%s, %s) from step %d", preset,
             parameterization, start)

    uc = (None if uncond_context is None
          else jnp.asarray(uncond_context, jnp.float32))
    if cond_dropout and uc is None and unet_config.context_dim is not None:
        # null context for CFG training: the empty-prompt embedding when a
        # text encoder is wired, zeros otherwise (documented default)
        uc = jnp.zeros((1, unet_config.context_dim))
    step_fn = make_latent_train_step(
        lambda p, z, t, c: unet.apply(p, z, t, None, c, deterministic=True),
        tx, betas, encode_fn=encode_fn, parameterization=parameterization,
        cond_dropout=cond_dropout, uncond_context=uc)
    step_fn = jax.jit(step_fn, donate_argnums=0)

    for step in range(start, max_steps):
        batch = next(data_iter)
        if isinstance(batch, (tuple, list)):
            images, context = batch
            context = jnp.asarray(context)
        else:
            images, context = batch, None
        if context is None and unet_config.context_dim is not None:
            # unconditional training of a conditional UNet: every sample
            # gets the null-context row (uncond_context or zeros)
            b = np.shape(images)[0]
            row = (uc if uc is not None
                   else jnp.zeros((1, unet_config.context_dim)))
            context = jnp.broadcast_to(row[None], (b,) + row.shape)
        state, metrics = step_fn(state, vae_params, jnp.asarray(images),
                                 context, rng)
        if step % log_freq == 0:
            log.info("step %d loss %.5g", step, float(metrics["loss"]))
        if step and step % snapshot_freq_for_preemption == 0:
            meta.save(step, state)
        if step and step % snapshot_freq == 0:
            ckpts.save(step, state)
    return state


def train_autoencoder(data_iter: Iterator, *,
                      workdir: str,
                      kind: str = "kl",
                      vae_config=None,
                      n_embed: int = 16384,
                      loss_config=None,
                      disc_ndf: int = 64, disc_n_layers: int = 3,
                      use_actnorm: bool = False,
                      lpips_params=None,
                      lr: float = 4.5e-6,
                      max_steps: int = 1000, log_freq: int = 50,
                      snapshot_freq: int = 10_000,
                      snapshot_freq_for_preemption: int = 1_000,
                      image_freq: int = 0,
                      seed: int = 0):
    """First-stage (AutoencoderKL / VQModel) adversarial training loop.

    TPU-native twin of the reference's autoencoder training — the
    PyTorch-Lightning harness (examples/stable-diffusion/main.py) driving
    `AutoencoderKL.training_step`'s two optimizers with the
    LPIPSWithDiscriminator / VQLPIPSWithDiscriminator losses. Here: one
    jitted step runs both optimizer passes (training/autoencoder.py),
    checkpoints are preemption-safe (restore-or-init + meta snapshots),
    and `image_freq` dumps input|reconstruction grids — the ImageLogger
    callback's role (main.py:289-394) — under workdir/recon.

    Args:
      data_iter: yields image batches [B,H,W,3] in [-1,1].
      kind: 'kl' | 'vq'.
      loss_config: training.perceptual.{KLLossConfig,VQLossConfig}
        (defaults: disc_start=0 with the reference's default weights).
      lpips_params: LPIPS variables from `models.lpips.convert_torch_lpips`
        (published weights) — random-init is used when None (valid as a
        random-feature perceptual metric, but load real weights for
        production parity); ignored when perceptual_weight == 0.
    """
    from dpm_solver_tpu.models.discriminator import NLayerDiscriminator
    from dpm_solver_tpu.models.lpips import LPIPS
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig, VQModel
    from dpm_solver_tpu.training import perceptual as P
    from dpm_solver_tpu.training.autoencoder import (
        bind_autoencoder,
        make_adversarial_state,
        make_kl_train_step,
        make_vq_train_step,
    )
    from dpm_solver_tpu.utils.logging import save_image_grid

    if kind not in ("kl", "vq"):
        raise ValueError(f"kind must be 'kl' or 'vq', got {kind!r}")
    is_kl = kind == "kl"
    if vae_config is None:
        vae_config = (VAEConfig.sd_v1() if is_kl else VAEConfig.vq_cin256())
    if loss_config is None:
        loss_config = P.KLLossConfig() if is_kl else P.VQLossConfig()

    rng = jax.random.PRNGKey(seed)
    rng, rng_m, rng_d, rng_l = jax.random.split(rng, 4)
    res = vae_config.resolution
    x0 = jnp.zeros((1, res, res, vae_config.in_channels))
    if is_kl:
        model = AutoencoderKL(config=vae_config)
        ae_params = jax.jit(lambda: model.init(rng_m, x0, rng_m))()["params"]
    else:
        model = VQModel(config=vae_config, n_embed=n_embed)
        ae_params = jax.jit(lambda: model.init(rng_m, x0))()["params"]
    disc = NLayerDiscriminator(ndf=disc_ndf, n_layers=disc_n_layers,
                               use_actnorm=use_actnorm)
    disc_vars = jax.jit(lambda: disc.init(rng_d, x0))()
    lpips = LPIPS()
    if lpips_params is None and loss_config.perceptual_weight > 0:
        log.warning("train_autoencoder: random-init LPIPS (no weights "
                    "supplied) — convert published weights for parity")
        lpips_params = jax.jit(lambda: lpips.init(rng_l, x0, x0))()
    fns = bind_autoencoder(model, disc, lpips)

    state, tx = make_adversarial_state(ae_params, disc_vars, lr=lr)
    maker = make_kl_train_step if is_kl else make_vq_train_step
    extra = {} if is_kl else {"n_embed": n_embed}
    step_fn = jax.jit(maker(loss_config, tx=tx, **fns, **extra),
                      donate_argnums=0)

    recon_fn = None
    if image_freq:
        if is_kl:
            recon_fn = jax.jit(lambda p, x: model.apply(
                {"params": p}, x, jax.random.PRNGKey(0))[0])
        else:
            recon_fn = jax.jit(lambda p, x: model.apply(
                {"params": p}, x)[0])

    ckpts = CheckpointManager(os.path.join(workdir, "checkpoints"),
                              max_to_keep=5)
    meta = CheckpointManager(os.path.join(workdir, "checkpoints-meta"),
                             max_to_keep=1)
    state = restore_or_init(meta, state)
    start = int(state.step)
    log.info("autoencoder training (%s, %dpx) from step %d", kind, res,
             start)

    for step in range(start, max_steps):
        images = jnp.asarray(next(data_iter))
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, images, sub, lpips_params)
        if step % log_freq == 0:
            log.info(
                "step %d nll %.5g disc %.5g", step,
                float(metrics.get("train/nll_loss", jnp.nan)),
                float(metrics.get("train/disc_loss", jnp.nan)))
        if image_freq and step % image_freq == 0 and recon_fn is not None:
            recon = recon_fn(state.gen_params["ae"], images)
            pair = np.concatenate([np.asarray(images), np.asarray(recon)],
                                  axis=2)  # input | recon side by side
            save_image_grid(
                np.clip((pair + 1.0) / 2.0, 0.0, 1.0),
                os.path.join(workdir, "recon", f"recon_{step:07d}.png"))
        if step and step % snapshot_freq_for_preemption == 0:
            meta.save(step, state)
        if step and step % snapshot_freq == 0:
            ckpts.save(step, state)
    return state
