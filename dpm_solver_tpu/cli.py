"""Command-line entry points: `python -m dpm_solver_tpu.cli <cmd>`.

L4 twin of the reference CLIs (ddpm_and_guided-diffusion/main.py:19-277,
score_sde_jax/main.py:28-63, stable-diffusion/scripts/txt2img.py:97-345):

  sample   — generate a batch with DPM-Solver from a named config
             (optionally from a converted torch checkpoint), save npz/PNGs
  train    — run the training loop on a local dataset
  eval     — checkpoint-polling FID/IS evaluation
  txt2img  — Stable-Diffusion text-to-image from a CompVis checkpoint
  configs  — list registered configs

Everything runs single-controller over all visible devices; no mp.spawn /
NCCL orchestration needed (SURVEY.md §2.6).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys

import numpy as np


def _save_images(arr: np.ndarray, outdir: str, prefix: str = "sample"):
    """[B,H,W,C] floats in [0,1] -> PNGs + one npz. Encoding runs through
    the native threaded writer (dpm_solver_tpu.native; the 50k-sample FID
    protocol of ref runners/diffusion.py:450-457 is PNG-write-bound on the
    host), with a PIL fallback inside write_png_batch."""
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, f"{prefix}.npz"), samples=arr)
    from dpm_solver_tpu import native

    imgs = (arr * 255).clip(0, 255).astype(np.uint8)
    paths = [os.path.join(outdir, f"{prefix}_{i:05d}.png")
             for i in range(len(imgs))]
    native.write_png_batch(imgs, paths)


def _build_sampler_from_config(config, params, model, *, labels=None,
                               classifier=None, classifier_params=None,
                               low_res=None):
    """Mirror of the reference runner's solver assembly
    (runners/diffusion.py:594-639): class-conditional nets get random labels
    and an optional classifier-guidance term; learned-sigma nets (out=2*in)
    use only the mean split (:600-603); `low_res` feeds SuperResModel
    conditioning (:540-546 model_kwargs['low_res'])."""
    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu import DPM_Solver, NoiseScheduleVP, model_wrapper

    scfg = config.sampling
    d = config.data
    tcfg = config.training
    # continuously-trained score_sde nets use the closed-form linear
    # schedule + t*999 labels (ref sampling.py:562,571 get_dpm_solver_sampler
    # / models/utils.py get_noise_fn); discrete nets use the beta table —
    # e.g. imagenet64's iDDPM is cosine with 4000 steps, NOT linear/1000
    # (configs/imagenet64.yml diffusion: beta_schedule: cosine)
    # VP only: subVP/VE nets are not DPM-Solver-compatible (they route
    # through _uses_pc_sampling before reaching here)
    continuous_score = (config.model_family == "ncsnpp" and tcfg.continuous
                        and tcfg.sde == "vpsde")
    if continuous_score:
        ns = NoiseScheduleVP.linear(tcfg.beta_min, tcfg.beta_max)
    else:
        ns = NoiseScheduleVP.discrete(betas=config.diffusion.betas())

    mc = config.model_config
    split_mean = getattr(mc, "out_channels", d.channels) == 2 * d.channels

    def raw(x, t):
        if low_res is not None:
            from dpm_solver_tpu.models.adm_unet import super_res_inputs

            x = super_res_inputs(x, low_res)
        if continuous_score:
            # wrapper passes continuous t through unchanged for
            # non-discrete schedules; the net's label is t*999
            out = model.apply(params, x, t * 999.0, deterministic=True)
        elif config.model_family == "ddpm_unet":
            out = model.apply(params, x, t)
        elif labels is not None:
            out = model.apply(params, x, t, labels, deterministic=True)
        else:
            out = model.apply(params, x, t, deterministic=True)
        return out[..., : d.channels] if split_mean else out

    if classifier is not None and scfg.classifier_scale > 0:
        def log_prob(x, t, y):
            logits = classifier.apply(classifier_params, x, t,
                                      deterministic=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return logp[jnp.arange(x.shape[0]), y]

        model_fn = model_wrapper(
            raw, ns, model_type="noise", guidance_type="classifier",
            condition=labels, guidance_scale=scfg.classifier_scale,
            classifier_fn=lambda x, t, y: log_prob(x, t, y))
    else:
        model_fn = model_wrapper(raw, ns, model_type="noise")
    solver = DPM_Solver(
        model_fn, ns, algorithm_type=scfg.algorithm_type,
        correcting_x0_fn="dynamic_thresholding" if scfg.thresholding else None)
    return solver, ns


def _uses_pc_sampling(config) -> bool:
    """VE and subVP checkpoints are not VP-form, so DPM-Solver does not
    apply; the reference samples them with the PC loop (configs set
    sampling.method='pc'; score_sde get_noise_fn raises NotImplementedError
    for anything but continuous VPSDE, models/utils.py:178-191)."""
    return (config.training.sde in ("vesde", "subvpsde")
            and config.model_family in ("ncsnpp", "ncsnv2", "ddpm_unet"))


def _build_pc_sampler_from_config(config, model):
    """Returns (sde, sampler) where sampler(params, x_T, rng) -> (x0, nfe)
    is jitted ONCE with params as an argument (big weights must be jit
    arguments, not closure constants) — callers across eval rounds reuse
    the same executable (ref sampling.py:391-456 pc loop; run_lib.py VESDE
    sampling_eps = 1e-5, VP/subVP 1e-3)."""
    import jax

    from dpm_solver_tpu.run_lib import _make_sde, score_net_apply
    from dpm_solver_tpu.samplers import get_pc_sampler
    from dpm_solver_tpu.score import get_score_fn

    scfg = config.sampling
    sde = _make_sde(config)
    eps = 1e-5 if config.training.sde == "vesde" else 1e-3
    apply_fn = score_net_apply(model, config.model_family)

    def run(params, x_T, rng):
        score_fn = get_score_fn(sde, lambda x, lab: apply_fn(params, x, lab),
                                continuous=config.training.continuous)
        return get_pc_sampler(
            sde, score_fn, predictor=scfg.predictor,
            corrector=scfg.corrector, snr=scfg.snr,
            n_corrector_steps=scfg.n_steps_each, eps=eps)(x_T, rng)

    return sde, jax.jit(run)


def cmd_sample(args):
    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.data import inverse_data_transform
    from dpm_solver_tpu.run_lib import build_model

    config = get_config(args.config)
    scfg = config.sampling
    overrides = {k: getattr(args, k) for k in ("steps", "order", "method")
                 if getattr(args, k, None) is not None}
    if overrides:
        if _uses_pc_sampling(config):
            raise SystemExit(
                "--steps/--order/--method are DPM-Solver knobs; config "
                f"{args.config!r} samples through the PC loop (VE/subVP) "
                "which ignores them")
        scfg = dataclasses.replace(scfg, **overrides)
    model, init_fn = build_model(config)

    if args.ckpt:
        from dpm_solver_tpu.utils.convert import (
            convert_adm_unet,
            convert_ddpm_unet,
            load_torch_state_dict,
        )

        if config.model_family == "ncsnpp":
            from dpm_solver_tpu.models.ncsnpp_convert import (
                load_score_sde_checkpoint,
                load_score_sde_torch_checkpoint,
                params_from_reference,
            )

            if args.ckpt.endswith((".pth", ".pt", ".ckpt")):
                # score_sde_pytorch checkpoint (torch pickle)
                params = load_score_sde_torch_checkpoint(
                    args.ckpt, config.model_config)
            else:
                # score_sde_jax checkpoints are flax State files
                params = params_from_reference(
                    load_score_sde_checkpoint(args.ckpt), config.model_config)
        elif config.model_family == "ncsnv2":
            from dpm_solver_tpu.models.ncsnpp_convert import (
                load_score_sde_checkpoint,
            )
            from dpm_solver_tpu.models.ncsnv2 import (
                ncsnv2_params_from_reference,
            )

            params = ncsnv2_params_from_reference(
                load_score_sde_checkpoint(args.ckpt), config.model_config)
        elif config.model_family == "ddpm_unet":
            params = convert_ddpm_unet(load_torch_state_dict(args.ckpt))
        else:
            params = convert_adm_unet(load_torch_state_dict(args.ckpt),
                                      config.model_config)
    else:
        logging.warning("no --ckpt given; sampling from RANDOM weights")
        params = init_fn(jax.random.PRNGKey(config.seed))

    d = config.data
    labels = None
    if getattr(config.model_config, "num_classes", None):
        labels = jax.random.randint(
            jax.random.PRNGKey(args.seed + 1), (args.batch,), 0,
            config.model_config.num_classes)
    classifier = classifier_params = None
    if args.classifier_ckpt and config.classifier_config is not None:
        from dpm_solver_tpu.models import ADMClassifier
        from dpm_solver_tpu.utils.convert import (
            convert_adm_unet,
            load_torch_state_dict,
        )

        classifier = ADMClassifier(config=config.classifier_config)
        classifier_params = convert_adm_unet(
            load_torch_state_dict(args.classifier_ckpt),
            config.classifier_config, classifier=True)
    low_res = None
    if getattr(args, "base_samples", None):
        # upsampling runs (ref runners/diffusion.py:31-52,420-446): the npz
        # carries uint8 NHWC images in arr_0 and optional labels in arr_1
        obj = np.load(args.base_samples)
        arr = obj["arr_0"][: args.batch]
        low_res = jnp.asarray(arr, jnp.float32) / 127.5 - 1.0
        if "arr_1" in getattr(obj, "files", ()):
            labels = jnp.asarray(obj["arr_1"][: args.batch])
        if arr.shape[0] < args.batch:
            raise SystemExit(f"--base-samples holds {arr.shape[0]} images "
                             f"< batch {args.batch}")
    if _uses_pc_sampling(config):
        sde, sampler = _build_pc_sampler_from_config(config, model)
        rng = jax.random.PRNGKey(args.seed)
        x_T = sde.prior_sampling(
            rng, (args.batch, d.image_size, d.image_size, d.channels))
        out, nfe = sampler(params, x_T, jax.random.fold_in(rng, 1))
        imgs = np.asarray(inverse_data_transform(config.data, out))
        _save_images(imgs, args.outdir)
        print(f"wrote {imgs.shape[0]} samples to {args.outdir} "
              f"(pc {scfg.predictor}/{scfg.corrector}, nfe={int(nfe)})")
        return

    solver, _ = _build_sampler_from_config(
        config, params, model, labels=labels, classifier=classifier,
        classifier_params=classifier_params, low_res=low_res)
    mode = getattr(args, "mode", "fid")
    sample_shape = (d.image_size, d.image_size, d.channels)
    if mode == "interpolation":
        # slerp grid between two noise draws (ref runners/diffusion.py:
        # 484-522 sample_interpolation)
        from dpm_solver_tpu.samplers import interpolation_grid

        x_T = interpolation_grid(jax.random.PRNGKey(args.seed), sample_shape,
                                 n=args.batch)
    else:
        x_T = jax.random.normal(jax.random.PRNGKey(args.seed),
                                (args.batch,) + sample_shape)
    mesh = None
    if getattr(args, "devices", None):
        from dpm_solver_tpu.parallel import make_mesh

        n = args.devices
        if args.batch % n:
            raise SystemExit(f"--batch {args.batch} not divisible by "
                             f"--devices {n}")
        if n > len(jax.devices()):
            raise SystemExit(f"--devices {n} but only {len(jax.devices())} "
                             f"visible (set XLA_FLAGS="
                             f"--xla_force_host_platform_device_count={n} "
                             f"for a CPU mesh)")
        mesh = make_mesh(jax.devices()[:n])

    def run():
        return solver.sample(
            x_T, steps=scfg.steps, t_start=scfg.t_start,
            t_end=scfg.t_end or 1e-3, order=scfg.order,
            skip_type=scfg.skip_type, method=scfg.method,
            lower_order_final=scfg.lower_order_final,
            return_intermediate=(mode == "sequence"), mesh=mesh)

    if getattr(args, "trace_dir", None):
        # XProf/TensorBoard trace of ONE warm trajectory: compile outside
        # the capture (a trace of XLA compilation is noise), then record
        # the steady-state program the profiler annotations (trace_span,
        # utils/logging.py:114) label. Replaces the reference's commented
        # CUDA-event timing blocks (runners/diffusion.py:426-449).
        jax.block_until_ready(jax.tree.leaves(run())[0])  # compile + warm
        with jax.profiler.trace(args.trace_dir):
            out = run()
            jax.block_until_ready(jax.tree.leaves(out)[0])
        print(f"profiler trace written to {args.trace_dir}")
    else:
        out = run()
    if mode == "sequence":
        # per-step trajectory snapshots (ref runners/diffusion.py:461-482
        # sample_sequence): files named {sample}_{step}.png
        out, intermediates = out
        for step_i, x_i in enumerate(intermediates):
            imgs = np.asarray(inverse_data_transform(config.data, x_i))
            _save_images(imgs, args.outdir, prefix=f"seq_step{step_i:03d}")
    imgs = np.asarray(inverse_data_transform(config.data, out))
    _save_images(imgs, args.outdir)
    print(f"wrote {imgs.shape[0]} samples to {args.outdir} (mode={mode})")


def cmd_train(args):
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.data import load_cifar10_dir, make_dataset, numpy_iterator
    from dpm_solver_tpu.run_lib import train

    config = get_config(args.config, workdir=args.workdir)
    if args.batch_size:
        config = dataclasses.replace(
            config, training=dataclasses.replace(
                config.training, batch_size=args.batch_size))
    if args.data_path and (args.data_path.endswith(".mdb") or os.path.exists(
            os.path.join(args.data_path, "data.mdb"))):
        # LSUN-style LMDB environment (ref datasets/lsun.py) via the
        # pure-Python reader — no lmdb C module in this image
        from dpm_solver_tpu.data import lsun_dataset

        ds = lsun_dataset(args.data_path,
                          resolution=config.data.image_size,
                          batch_size=config.training.batch_size,
                          centered=config.data.centered)
        state = train(config, numpy_iterator(ds), workdir=args.workdir,
                      max_steps=args.max_steps)
        print(f"finished at step {int(state.step)}")
        return
    if args.data_path and os.path.isdir(args.data_path) and \
            config.data.dataset == "cifar10":
        images = load_cifar10_dir(args.data_path)
    elif args.data_path:
        images = np.load(args.data_path)["images"]
    else:
        raise SystemExit("--data-path required (zero-egress environment)")
    ds = make_dataset(images, batch_size=config.training.batch_size,
                      centered=config.data.centered,
                      uniform_dequantization=config.data.uniform_dequantization)
    state = train(config, numpy_iterator(ds), workdir=args.workdir,
                  max_steps=args.max_steps)
    print(f"finished at step {int(state.step)}")


def cmd_train_ae(args):
    """First-stage adversarial training (LPIPS + PatchGAN two-optimizer
    loop; ref main.py + ldm/models/autoencoder.py training_step)."""
    import numpy as np

    from dpm_solver_tpu.run_lib import train_autoencoder
    from dpm_solver_tpu.training import perceptual as P

    data = np.load(args.data_path)
    images = np.asarray(data["images"] if "images" in data else data)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 127.5 - 1.0

    rs = np.random.default_rng(0)

    def batches():
        n = images.shape[0]
        while True:
            yield images[rs.integers(0, n, size=args.batch_size)]

    vae_config = None
    disc_kw = dict(disc_ndf=args.disc_ndf, disc_n_layers=args.disc_n_layers)
    if args.tiny:
        from dpm_solver_tpu.models.vae import VAEConfig

        vae_config = VAEConfig.tiny(resolution=images.shape[1],
                                    attn_resolutions=(),
                                    double_z=(args.kind == "kl"))
        disc_kw = dict(disc_ndf=8, disc_n_layers=2)
    cfg_cls = P.KLLossConfig if args.kind == "kl" else P.VQLossConfig
    loss_config = cfg_cls(disc_start=args.disc_start,
                          perceptual_weight=args.perceptual_weight)

    lpips_params = None
    if args.lpips_ckpt:
        import torch

        from dpm_solver_tpu.models.lpips import convert_torch_lpips

        sd = torch.load(args.lpips_ckpt, map_location="cpu",
                        weights_only=False)
        lpips_params = convert_torch_lpips(
            sd.get("state_dict", sd) if isinstance(sd, dict) else sd)

    state = train_autoencoder(
        batches(), workdir=args.workdir, kind=args.kind,
        vae_config=vae_config, loss_config=loss_config,
        lpips_params=lpips_params, lr=args.lr, max_steps=args.max_steps,
        log_freq=args.log_freq, snapshot_freq=args.snapshot_freq,
        snapshot_freq_for_preemption=args.snapshot_freq_for_preemption,
        image_freq=args.image_freq, **disc_kw)
    print(f"finished at step {int(state.step)}")


def cmd_train_latent(args):
    """LDM training / fine-tuning: frozen first stage, UNet trains
    (ref main.py Lightning harness -> run_lib.train_latent plain loop)."""
    import numpy as np

    from dpm_solver_tpu.run_lib import train_latent

    data = np.load(args.data_path)
    images = np.asarray(data["images"])
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 127.5 - 1.0
    context = np.asarray(data["context"]) if "context" in data else None

    rs = np.random.default_rng(0)

    def batches():
        n = images.shape[0]
        while True:
            idx = rs.integers(0, n, size=args.batch_size)
            if context is None:
                yield images[idx]
            else:
                yield images[idx], context[idx]

    init_model = None
    unet_config = vae_config = None
    if args.sd_ckpt:
        from dpm_solver_tpu.pipelines.stable_diffusion import load_sd_checkpoint

        init_model = load_sd_checkpoint(args.sd_ckpt, preset=args.preset)
    elif args.tiny:
        from dpm_solver_tpu.models.adm_unet import ADMConfig
        from dpm_solver_tpu.models.vae import VAEConfig

        unet_config = ADMConfig(
            image_size=8, in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2, use_spatial_transformer=True, transformer_depth=1,
            context_dim=context.shape[-1] if context is not None else 24)
        vae_config = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                               z_channels=4, embed_dim=4,
                               resolution=images.shape[1])
    state = train_latent(
        args.preset, batches(), workdir=args.workdir,
        unet_config=unet_config, vae_config=vae_config,
        init_model=init_model, parameterization=args.parameterization,
        cond_dropout=args.cond_dropout, lr=args.lr,
        optimizer=args.optimizer, remat=args.remat,
        max_steps=args.max_steps, log_freq=args.log_freq,
        snapshot_freq=args.snapshot_freq,
        snapshot_freq_for_preemption=args.snapshot_freq_for_preemption)
    print(f"finished at step {int(state.step)}")


def cmd_eval(args):
    import jax

    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.run_lib import (
        build_model,
        evaluate,
        uses_legacy_discrete_loss,
    )

    config = get_config(args.config, workdir=args.workdir)
    if args.batch_size:
        config = dataclasses.replace(
            config, eval=dataclasses.replace(config.eval,
                                             batch_size=args.batch_size))
    if args.bpd_rounds:
        config = dataclasses.replace(
            config, eval=dataclasses.replace(config.eval, enable_bpd=True))
    model, _ = build_model(config)
    scfg = config.sampling
    n_classes = getattr(config.model_config, "num_classes", None)

    # PC sampler built ONCE (params are a jit argument; per-round rebuild
    # would recompile the full N-step scan every round)
    _pc = (_build_pc_sampler_from_config(config, model)
           if _uses_pc_sampling(config) else None)

    def sample_fn(state, rng):
        d = config.data
        shape = (config.eval.batch_size, d.image_size, d.image_size,
                 d.channels)
        if _pc is not None:
            from dpm_solver_tpu.data import inverse_data_transform

            sde, sampler = _pc
            rng, rng_x = jax.random.split(rng)
            out, _ = sampler(state.ema_params,
                             sde.prior_sampling(rng_x, shape), rng)
            return np.asarray(inverse_data_transform(d, out))
        rng, rng_y = jax.random.split(rng)
        # class-conditional nets need labels or apply() asserts
        labels = (jax.random.randint(rng_y, (config.eval.batch_size,), 0,
                                     n_classes) if n_classes else None)
        solver, _ = _build_sampler_from_config(config, state.ema_params,
                                               model, labels=labels)
        x_T = jax.random.normal(rng, shape)
        out = solver.sample(x_T, steps=scfg.steps, t_end=scfg.t_end or 1e-3,
                            order=scfg.order, skip_type=scfg.skip_type,
                            method=scfg.method)
        from dpm_solver_tpu.data import inverse_data_transform

        return np.asarray(inverse_data_transform(d, out))

    feature_fn = None
    if config.eval.inception_ckpt_path:
        from dpm_solver_tpu.eval.inception import (
            convert_fid_inception,
            make_feature_fn,
        )
        from dpm_solver_tpu.utils.convert import load_torch_state_dict

        params = convert_fid_inception(
            load_torch_state_dict(config.eval.inception_ckpt_path))
        feature_fn = make_feature_fn(params)

    # loss / bits-per-dim hooks need eval DATA (ref run_lib.py:253-311);
    # only wired when --data-path is given and the config is a continuous
    # score model
    loss_fn = bpd_fn = None
    if args.data_path and config.training.continuous:
        from dpm_solver_tpu.data import make_dataset, numpy_iterator
        from dpm_solver_tpu.likelihood import get_likelihood_fn
        from dpm_solver_tpu.run_lib import _make_sde
        from dpm_solver_tpu.score import get_score_fn
        from dpm_solver_tpu.training.losses import sde_loss_fn

        images = np.load(args.data_path)["images"]
        ds = make_dataset(images, batch_size=config.eval.batch_size,
                          num_local_devices=1, random_flip=False,
                          centered=config.data.centered,
                          uniform_dequantization=True, shuffle=True)
        data_iter = numpy_iterator(ds)

        def _batch():
            b = next(data_iter)
            import jax.numpy as jnp

            return jnp.asarray(b).reshape((-1,) + b.shape[-3:])

        sde = _make_sde(config)

        def _score(state):
            return get_score_fn(
                sde, lambda x, t: model.apply(state.ema_params, x, t,
                                              deterministic=True),
                continuous=True)

        def loss_fn(state, rng):
            fn = sde_loss_fn(sde, lambda p, x, t: get_score_fn(
                sde, lambda xx, tt: model.apply(p, xx, tt,
                                                deterministic=True),
                continuous=True)(x, t), reduce_mean=config.training.reduce_mean)
            return fn(state.ema_params, _batch(), rng)

        def bpd_fn(state, rng):
            lf = get_likelihood_fn(
                sde, _score(state),
                inverse_scaler_grad=0.5 if config.data.centered else 1.0)
            return lf(rng, _batch())[0]

    elif args.data_path and uses_legacy_discrete_loss(config):
        # discretely-trained score nets: eval loss is the legacy objective
        # (ref losses.py get_step_fn routes SMLD/DDPM when not continuous)
        import jax.numpy as jnp

        from dpm_solver_tpu.data import make_dataset, numpy_iterator
        from dpm_solver_tpu.run_lib import legacy_loss_fn

        images = np.load(args.data_path)["images"]
        ds = make_dataset(images, batch_size=config.eval.batch_size,
                          num_local_devices=1, random_flip=False,
                          centered=config.data.centered, shuffle=True)
        data_iter = numpy_iterator(ds)
        _loss = legacy_loss_fn(config, model)

        def loss_fn(state, rng):
            b = next(data_iter)
            x = jnp.asarray(b).reshape((-1,) + b.shape[-3:])
            return _loss(state.ema_params, x, rng)

    results = evaluate(config, workdir=args.workdir, sample_fn=sample_fn,
                       feature_fn=feature_fn, rounds=args.rounds,
                       loss_fn=loss_fn, bpd_fn=bpd_fn,
                       bpd_rounds=args.bpd_rounds)
    print(results)


def cmd_txt2img(args):
    import jax

    from dpm_solver_tpu.models.text_encoder import FrozenCLIPEmbedder
    from dpm_solver_tpu.pipelines import StableDiffusionPipeline, load_sd_checkpoint

    text = FrozenCLIPEmbedder(args.clip) if args.clip else None
    ldm = load_sd_checkpoint(args.ckpt, text_encode=text,
                             quant=getattr(args, "quant", None))
    pipe = StableDiffusionPipeline(ldm)
    if args.safety_ckpt and not args.clip:
        raise SystemExit("--safety-ckpt needs --clip (the CLIP vision tower "
                         "that embeds images for the concept screen)")
    imgs = np.asarray(pipe.txt2img(
        [args.prompt] * args.batch, steps=args.steps,
        guidance_scale=args.scale, height=args.H, width=args.W,
        rng=jax.random.PRNGKey(args.seed), method=args.method))
    if args.safety_ckpt:
        # ref txt2img.py:88-95 check_safety: flagged samples are replaced
        from dpm_solver_tpu.models.text_encoder import FrozenCLIPImageEmbedder
        from dpm_solver_tpu.utils.safety import load_safety_checker

        checker = load_safety_checker(
            args.safety_ckpt, FrozenCLIPImageEmbedder(args.clip))
        imgs, flags = checker(imgs * 2.0 - 1.0)
        imgs = (imgs + 1.0) / 2.0
        if flags.any():
            print(f"safety checker replaced {int(flags.sum())} sample(s)")
    if args.wm:
        # ref txt2img.py:261-264,325: invisible watermark on every output
        from dpm_solver_tpu.utils.watermark import put_watermark

        u8 = (imgs * 255).clip(0, 255).astype(np.uint8)
        imgs = np.stack([put_watermark(im, args.wm) for im in u8]) / 255.0
    _save_images(np.asarray(imgs), args.outdir, prefix="txt2img")
    print(f"wrote {args.batch} images to {args.outdir}")


def _load_image(path, *, gray: bool = False):
    """PNG/JPEG/npz -> float array; images map to [-1,1], masks to [0,1]."""
    if path.endswith(".npz"):
        d = np.load(path)
        return np.asarray(d[list(d.keys())[0]], np.float32)
    from PIL import Image

    img = Image.open(path).convert("L" if gray else "RGB")
    arr = np.asarray(img, np.float32) / 255.0
    return arr[None] if gray else (arr[None] * 2.0 - 1.0)


def _make_sd_pipe(args):
    from dpm_solver_tpu.models.text_encoder import FrozenCLIPEmbedder
    from dpm_solver_tpu.pipelines import (
        StableDiffusionPipeline,
        load_sd_checkpoint,
    )

    text = FrozenCLIPEmbedder(args.clip) if args.clip else None
    return StableDiffusionPipeline(load_sd_checkpoint(args.ckpt,
                                                      text_encode=text))


def cmd_img2img(args):
    import jax

    pipe = _make_sd_pipe(args)
    init = np.repeat(_load_image(args.init_img), args.batch, axis=0)
    imgs = pipe.img2img(init, [args.prompt] * args.batch,
                        strength=args.strength, steps=args.steps,
                        guidance_scale=args.scale,
                        rng=jax.random.PRNGKey(args.seed))
    _save_images(np.asarray(imgs), args.outdir, prefix="img2img")
    print(f"wrote {args.batch} images to {args.outdir}")


def cmd_inpaint(args):
    import jax

    pipe = _make_sd_pipe(args)
    init = np.repeat(_load_image(args.init_img), args.batch, axis=0)
    mask = np.repeat((_load_image(args.mask, gray=True) >= 0.5)
                     .astype(np.float32), args.batch, axis=0)
    imgs = pipe.inpaint(init, mask, [args.prompt] * args.batch,
                        steps=args.steps, guidance_scale=args.scale,
                        rng=jax.random.PRNGKey(args.seed))
    _save_images(np.asarray(imgs), args.outdir, prefix="inpaint")
    print(f"wrote {args.batch} images to {args.outdir}")


def cmd_knn2img(args):
    """Retrieval-augmented sampling (ref scripts/knn2img.py): CLIP text
    query + k nearest database image embeddings -> RDM -> images."""
    import jax

    from dpm_solver_tpu.models.text_encoder import FrozenCLIPTextJointEmbedder
    from dpm_solver_tpu.pipelines import load_sd_checkpoint
    from dpm_solver_tpu.pipelines.retrieval import Searcher, knn2img

    # the rdm_768 preset carries the 768x768.yaml schedule/scale constants
    ldm = load_sd_checkpoint(args.ckpt, preset="rdm_768",
                             parameterization="eps")
    text = FrozenCLIPTextJointEmbedder(args.clip)
    searcher = Searcher(args.database) if args.database else None
    imgs = knn2img(ldm, [args.prompt] * args.batch, text_embedder=text,
                   searcher=searcher, knn=args.knn, steps=args.steps,
                   guidance_scale=args.scale, height=args.H, width=args.W,
                   rng=jax.random.PRNGKey(args.seed))
    _save_images(np.asarray(imgs), args.outdir, prefix="knn2img")
    print(f"wrote {args.batch} images to {args.outdir}")


def cmd_clscond(args):
    """Class-conditional LDM sampling (ref scripts/sample_diffusion.py)."""
    import jax

    from dpm_solver_tpu.models.text_encoder import ClassEmbedder
    from dpm_solver_tpu.pipelines import (
        class_conditional_sample,
        load_sd_checkpoint,
    )

    ldm = load_sd_checkpoint(args.ckpt, preset=args.preset)
    labels = np.asarray([int(c) for c in args.classes.split(",")], np.int64)
    embedder = ClassEmbedder(args.num_classes + 1, args.embed_dim)
    imgs = class_conditional_sample(
        ldm, embedder, labels, steps=args.steps,
        guidance_scale=args.scale,
        uncond_label=args.num_classes if args.scale != 1.0 else None,
        rng=jax.random.PRNGKey(args.seed))
    _save_images(np.asarray(imgs), args.outdir, prefix="clscond")
    print(f"wrote {len(labels)} images to {args.outdir}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(prog="dpm_solver_tpu")
    p.add_argument("--compile-cache", default=os.environ.get(
        "DPM_SOLVER_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/dpm_solver_tpu/xla")),
        help="persistent XLA compilation cache dir ('' disables); first "
             "compile of a big UNet takes minutes, cached reloads take "
             "seconds")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("sample", help="DPM-Solver sampling from a config")
    sp.add_argument("--config", required=True)
    sp.add_argument("--ckpt", default=None, help="torch checkpoint to convert")
    sp.add_argument("--classifier-ckpt", default=None,
                    help="torch classifier checkpoint for guided configs")
    sp.add_argument("--batch", type=int, default=16)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--outdir", default="./samples")
    sp.add_argument("--base-samples", default=None,
                    help="npz of low-res images (arr_0 [+labels arr_1]) for "
                         "SuperRes upsampling runs")
    sp.add_argument("--mode", choices=("fid", "sequence", "interpolation"),
                    default="fid",
                    help="fid: iid batch; sequence: save per-step "
                         "trajectory; interpolation: slerp grid between "
                         "two noise draws (ref runner modes)")
    sp.add_argument("--steps", type=int, default=None,
                    help="override the config's NFE budget")
    sp.add_argument("--order", type=int, default=None)
    sp.add_argument("--method", default=None,
                    choices=("multistep", "singlestep", "singlestep_fixed",
                             "adaptive", "unipc"),
                    help="override the config's solver method (unipc = "
                         "predictor-corrector, beyond the reference)")
    sp.add_argument("--devices", type=int, default=None,
                    help="shard the batch over the first N visible devices "
                         "(one pjit program, weights replicated) — replaces "
                         "the reference's mp.spawn/DDP sampling launcher; "
                         "default: single device")
    sp.add_argument("--trace-dir", default=None,
                    help="capture an XProf/TensorBoard profiler trace of one "
                         "warm sampling trajectory into this directory "
                         "(compile happens outside the capture)")
    sp.set_defaults(fn=cmd_sample)

    tp = sub.add_parser("train")
    tp.add_argument("--config", required=True)
    tp.add_argument("--workdir", default="./workdir")
    tp.add_argument("--data-path", default=None)
    tp.add_argument("--max-steps", type=int, default=None)
    tp.add_argument("--batch-size", type=int, default=None,
                    help="override the config's training batch size")
    tp.set_defaults(fn=cmd_train)

    ta = sub.add_parser("train-ae",
                        help="first-stage autoencoder training "
                             "(LPIPS + PatchGAN adversarial loop)")
    ta.add_argument("--kind", default="kl", choices=("kl", "vq"))
    ta.add_argument("--workdir", default="./workdir")
    ta.add_argument("--data-path", required=True,
                    help="npz/npy with 'images' [N,H,W,3] (uint8 or "
                         "[-1,1] float)")
    ta.add_argument("--tiny", action="store_true",
                    help="shrunken geometry (hermetic smoke)")
    ta.add_argument("--batch-size", type=int, default=4)
    ta.add_argument("--max-steps", type=int, default=1000)
    ta.add_argument("--lr", type=float, default=4.5e-6)
    ta.add_argument("--disc-start", type=int, default=50_001)
    ta.add_argument("--disc-ndf", type=int, default=64)
    ta.add_argument("--disc-n-layers", type=int, default=3)
    ta.add_argument("--perceptual-weight", type=float, default=1.0)
    ta.add_argument("--lpips-ckpt", default=None,
                    help="torch LPIPS/VGG state dict to convert")
    ta.add_argument("--image-freq", type=int, default=0,
                    help="dump input|recon grids every N steps")
    ta.add_argument("--log-freq", type=int, default=50)
    ta.add_argument("--snapshot-freq", type=int, default=10_000)
    ta.add_argument("--snapshot-freq-for-preemption", type=int,
                    default=1_000)
    ta.set_defaults(fn=cmd_train_ae)

    tl = sub.add_parser("train-latent",
                        help="latent-diffusion training: frozen first "
                             "stage, UNet trains (LDM p_losses)")
    tl.add_argument("--preset", default="sd_v1",
                    choices=("sd_v1", "sd_v2_1", "cin256", "rdm_768"))
    tl.add_argument("--workdir", default="./workdir")
    tl.add_argument("--data-path", required=True,
                    help="npz with 'images' [N,H,W,3] (uint8 or [-1,1] "
                         "float) and optional 'context' [N,L,D]")
    tl.add_argument("--sd-ckpt", default=None,
                    help="CompVis checkpoint to fine-tune from (UNet init "
                         "+ frozen first stage + schedule)")
    tl.add_argument("--tiny", action="store_true",
                    help="shrunken random-init geometry (hermetic smoke)")
    tl.add_argument("--batch-size", type=int, default=4)
    tl.add_argument("--max-steps", type=int, default=1000)
    tl.add_argument("--lr", type=float, default=1e-4)
    tl.add_argument("--cond-dropout", type=float, default=0.0)
    tl.add_argument("--parameterization", default=None,
                    choices=("eps", "x0", "v"))
    tl.add_argument("--optimizer", default="adam",
                    choices=("adam", "adafactor"),
                    help="adafactor = the one-chip full-size-SD recipe "
                         "(no 2x-params Adam states)")
    tl.add_argument("--remat", action="store_true",
                    help="per-block UNet rematerialization (bounds "
                         "backward activation memory)")
    tl.add_argument("--log-freq", type=int, default=50)
    tl.add_argument("--snapshot-freq", type=int, default=10_000)
    tl.add_argument("--snapshot-freq-for-preemption", type=int,
                    default=1_000)
    tl.set_defaults(fn=cmd_train_latent)

    ep = sub.add_parser("eval")
    ep.add_argument("--config", required=True)
    ep.add_argument("--workdir", default="./workdir")
    ep.add_argument("--rounds", type=int, default=None)
    ep.add_argument("--data-path", default=None,
                    help="npz with 'images' for eval loss / bits-per-dim")
    ep.add_argument("--bpd-rounds", type=int, default=0)
    ep.add_argument("--batch-size", type=int, default=None,
                    help="override the config's eval batch size")
    ep.set_defaults(fn=cmd_eval)

    xp = sub.add_parser("txt2img")
    xp.add_argument("--ckpt", required=True)
    xp.add_argument("--prompt", required=True)
    xp.add_argument("--clip", default=None, help="local CLIP checkpoint dir")
    xp.add_argument("--steps", type=int, default=25)
    xp.add_argument("--scale", type=float, default=7.5)
    xp.add_argument("--H", type=int, default=512)
    xp.add_argument("--W", type=int, default=512)
    xp.add_argument("--batch", type=int, default=1)
    xp.add_argument("--seed", type=int, default=42)
    xp.add_argument("--outdir", default="./outputs")
    xp.add_argument("--wm", default="StableDiffusionV1",
                    help="invisible watermark payload ('' disables)")
    xp.add_argument("--safety-ckpt", default=None,
                    help="local safety-checker torch checkpoint")
    xp.add_argument("--method", default="multistep",
                    choices=("multistep", "singlestep", "unipc"))
    xp.add_argument("--quant", default=None, choices=("w8a8", "w8a8_conv"),
                    help="int8 dynamic-quantized serving path: transformer "
                         "stack, or transformer + conv trunk (ops/quant.py)")
    xp.set_defaults(fn=cmd_txt2img)

    for name, fn, extra in (
            ("img2img", cmd_img2img, ("--strength",)),
            ("inpaint", cmd_inpaint, ("--mask",))):
        gp = sub.add_parser(name)
        gp.add_argument("--ckpt", required=True)
        gp.add_argument("--init-img", required=True,
                        help="input image (png/jpg/npz)")
        if "--mask" in extra:
            gp.add_argument("--mask", required=True,
                            help="mask image, white = regenerate")
        if "--strength" in extra:
            gp.add_argument("--strength", type=float, default=0.75)
        gp.add_argument("--prompt", required=True)
        gp.add_argument("--clip", default=None)
        gp.add_argument("--steps", type=int, default=25)
        gp.add_argument("--scale", type=float, default=7.5)
        gp.add_argument("--batch", type=int, default=1)
        gp.add_argument("--seed", type=int, default=42)
        gp.add_argument("--outdir", default="./outputs")
        gp.set_defaults(fn=fn)

    kp = sub.add_parser("knn2img", help="retrieval-augmented sampling")
    kp.add_argument("--ckpt", required=True, help="RDM checkpoint")
    kp.add_argument("--prompt", required=True)
    kp.add_argument("--clip", default="openai/clip-vit-large-patch14",
                    help="local CLIP checkpoint dir (joint-space embedder)")
    kp.add_argument("--database", default=None,
                    help=".npz embedding database (file or shard dir); "
                         "omit for text-only conditioning")
    kp.add_argument("--knn", type=int, default=10)
    kp.add_argument("--steps", type=int, default=50)
    kp.add_argument("--scale", type=float, default=5.0)
    kp.add_argument("--H", type=int, default=768)
    kp.add_argument("--W", type=int, default=768)
    kp.add_argument("--batch", type=int, default=3)
    kp.add_argument("--seed", type=int, default=42)
    kp.add_argument("--outdir", default="./outputs")
    kp.set_defaults(fn=cmd_knn2img)

    cp = sub.add_parser("clscond", help="class-conditional LDM sampling")
    cp.add_argument("--ckpt", required=True)
    cp.add_argument("--classes", required=True,
                    help="comma-separated class ids, one image each")
    cp.add_argument("--preset", default="cin256",
                    help="checkpoint geometry preset (cin256 | sd_v1 | ...)")
    cp.add_argument("--num-classes", type=int, default=1000)
    cp.add_argument("--embed-dim", type=int, default=512)
    cp.add_argument("--steps", type=int, default=20)
    cp.add_argument("--scale", type=float, default=1.5)
    cp.add_argument("--seed", type=int, default=42)
    cp.add_argument("--outdir", default="./outputs")
    cp.set_defaults(fn=cmd_clscond)

    fp = sub.add_parser("fid", help="FID between two sample sources "
                                    "(image folder / images npz / stats npz)")
    fp.add_argument("paths", nargs=2)
    fp.add_argument("--inception-ckpt", required=True,
                    help="local torch FID-InceptionV3 checkpoint")
    fp.add_argument("--batch-size", type=int, default=50)

    def _fid(a):
        from dpm_solver_tpu.eval.fid import calculate_fid_given_paths
        from dpm_solver_tpu.eval.inception import (
            convert_fid_inception,
            make_feature_fn,
        )
        from dpm_solver_tpu.utils.convert import load_torch_state_dict

        feature_fn = make_feature_fn(convert_fid_inception(
            load_torch_state_dict(a.inception_ckpt)))
        print(calculate_fid_given_paths(a.paths, feature_fn,
                                        batch_size=a.batch_size))

    fp.set_defaults(fn=_fid)

    wd = sub.add_parser("wmdecode",
                        help="decode an invisible watermark from an image "
                             "(ref scripts/tests/test_watermark.py)")
    wd.add_argument("image")
    wd.add_argument("--bits", type=int, default=136)

    def _wmdecode(a):
        from PIL import Image

        from dpm_solver_tpu.utils.watermark import decode_watermark_text

        arr = np.asarray(Image.open(a.image).convert("RGB"), np.uint8)
        print(decode_watermark_text(arr, a.bits) or "null")

    wd.set_defaults(fn=_wmdecode)

    lp = sub.add_parser("configs", help="list registered configs")
    lp.set_defaults(fn=lambda a: print("\n".join(
        __import__("dpm_solver_tpu.configs", fromlist=["list_configs"])
        .list_configs())))

    args = p.parse_args(argv)
    if args.compile_cache:
        import jax

        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args.fn(args)


if __name__ == "__main__":
    main()
