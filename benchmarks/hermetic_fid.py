"""Hermetic end-to-end FID loop: train -> sample -> PNG -> Inception -> FID.

Closes the reference's end-metric evaluation loop (runners/diffusion.py
sample_fid + evaluate/fid_score.py:246-262; score_sde run_lib.py:507-563)
without any external checkpoint or dataset: a tiny DDPM UNet is trained to
convergence on an in-repo procedural dataset (random Gaussian color blobs),
then

  1. `run_lib.evaluate` drives preemption-resumable sampling rounds with the
     ported FID-InceptionV3 as `feature_fn`, aggregating per-round feature
     stats exactly like the reference's statistics_r.npz pattern, and
     reports FID (vs. precomputed train stats) + Inception Score.
  2. The SAME samples are written as PNGs and re-scored through
     `calculate_fid_given_paths` (folder -> Inception -> Frechet), the
     reference's file-based protocol; the two FIDs must agree (PNG IO only
     differs by uint8 quantization, applied on both paths).
  3. A control: samples from the UNTRAINED model must score a much larger
     FID, demonstrating the metric discriminates.

The Inception network uses fixed random weights (no checkpoint in this
zero-egress image): FID is then a pipeline statistic, not comparable to
published numbers, but the loop itself — sampling, IO, feature extraction,
Frechet algebra, resume bookkeeping — is exercised end to end, which is
what this validates. Run: python benchmarks/hermetic_fid.py [--cpu]
[--train-steps 3000] [--n-samples 2048]; prints one JSON document.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def make_synthetic(n, side, seed):
    """Procedural dataset: 1-3 soft color blobs per image, in [-1, 1]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32) / side
    imgs = np.full((n, side, side, 3), -1.0, np.float32)
    for i in range(n):
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            r = rng.uniform(0.1, 0.3)
            color = rng.uniform(0.0, 1.0, 3).astype(np.float32)
            g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
            imgs[i] += 2.0 * g[..., None] * color
    return np.clip(imgs, -1.0, 1.0)


def to_uint8(x):
    return (np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0) * 255.0 + 0.5
            ).astype(np.uint8)


def save_pngs(arr_u8, outdir, prefix):
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    for i, im in enumerate(arr_u8):
        Image.fromarray(im).save(os.path.join(outdir, f"{prefix}{i:05d}.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--train-steps", type=int, default=3000)
    p.add_argument("--train-batch", type=int, default=128)
    p.add_argument("--n-samples", type=int, default=2048)
    p.add_argument("--sample-batch", type=int, default=256)
    p.add_argument("--n-ref", type=int, default=4096)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    import dataclasses

    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu import run_lib
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.eval import fid_from_features, inception_score
    from dpm_solver_tpu.eval.fid import (
        calculate_fid_given_paths,
        compute_statistics,
    )
    from dpm_solver_tpu.eval.inception import make_feature_fn
    from dpm_solver_tpu.training.checkpoints import CheckpointManager

    workdir = args.workdir or tempfile.mkdtemp(prefix="hermetic_fid_")
    side = 16
    config = get_config("tiny_test")
    config = dataclasses.replace(
        config,
        workdir=workdir,
        # default 0.9999 EMA would still be ~the random init after a few
        # thousand steps (0.995 converges within this budget), and the
        # tiny_test config checkpoints every 2 steps — at 3000 steps that
        # is ~1500 orbax saves dominating the wall clock
        training=dataclasses.replace(
            config.training, ema_rate=0.995,
            snapshot_freq=args.train_steps,
            snapshot_freq_for_preemption=args.train_steps,
            log_freq=max(1, args.train_steps // 10)),
        eval=dataclasses.replace(
            config.eval, batch_size=args.sample_batch,
            num_samples=args.n_samples,
            begin_ckpt=1, end_ckpt=args.train_steps,
            fid_stats_path=os.path.join(workdir, "ref_stats.npz"),
            enable_loss=False),
    )

    # ---- data ----
    print("# generating synthetic dataset", file=sys.stderr, flush=True)
    train = make_synthetic(max(args.n_ref, 8192), side, seed=0)

    def data_iter():
        rng = np.random.default_rng(1)
        while True:
            idx = rng.integers(0, len(train), args.train_batch)
            yield train[idx]

    # ---- train ----
    t0 = time.perf_counter()
    state = run_lib.train(config, data_iter(), workdir=workdir,
                          max_steps=args.train_steps)
    t_train = time.perf_counter() - t0
    # held-out eps-MSE, trained vs fresh init — proves learning happened
    from dpm_solver_tpu.schedule import NoiseScheduleVP as _NS
    from dpm_solver_tpu.training.train import make_train_state

    model_d, init_fn_d = run_lib.build_model(config)
    _ns = _NS.discrete(betas=config.diffusion.betas())

    def heldout_loss(params, seed=123):
        r = jax.random.PRNGKey(seed)
        xb = jnp.asarray(train[-256:])
        tt = jax.random.uniform(jax.random.fold_in(r, 0), (256,),
                                minval=1.0 / 1000, maxval=1.0)
        eps = jax.random.normal(jax.random.fold_in(r, 1), xb.shape)
        al = _ns.marginal_alpha(tt)[:, None, None, None]
        sg = _ns.marginal_std(tt)[:, None, None, None]
        xt = al * xb + sg * eps
        pred = model_d.apply(params, xt, (tt - 1e-3) * 1000.0)
        return float(jnp.mean((pred - eps) ** 2))

    loss_trained = heldout_loss(state.ema_params)
    loss_init = heldout_loss(init_fn_d(jax.random.PRNGKey(99)))
    print(f"# trained {args.train_steps} steps in {t_train:.0f}s; held-out "
          f"eps-MSE trained={loss_trained:.4f} init={loss_init:.4f}",
          file=sys.stderr, flush=True)
    # make the final state visible to the eval harness as a checkpoint
    ckpts = CheckpointManager(os.path.join(workdir, "checkpoints"))
    ckpts.save(args.train_steps, state)

    # ---- inception (fixed random weights; see module docstring).
    # random_feature_params randomizes the folded BN stats: flax default
    # init collapses features to near-constants (degenerate FID ~ 1e-7
    # for everything), randomized stays discriminative (measured 175x
    # blob-vs-noise separation) ----
    from dpm_solver_tpu.eval.inception import random_feature_params

    inc_params = random_feature_params(11, input_hw=side)
    feature_fn = make_feature_fn(inc_params)

    # reference statistics from the synthetic train set (uint8-quantized so
    # both scoring paths see identical pixel values)
    ref_u8 = to_uint8(train[: args.n_ref])
    feats = []
    for i in range(0, len(ref_u8), 256):
        f, _ = feature_fn(jnp.asarray(ref_u8[i:i + 256], jnp.float32) / 255.0)
        feats.append(np.asarray(f))
    mu_r, sig_r = compute_statistics(np.concatenate(feats))
    np.savez(config.eval.fid_stats_path, mu=mu_r, sigma=sig_r)

    # ---- sampler (10-NFE DPM-Solver++(3M), the canonical CIFAR config) ----
    model, _ = run_lib.build_model(config)
    ns = NoiseScheduleVP.discrete(betas=config.diffusion.betas())

    def sample_with(params, x_T):
        model_fn = model_wrapper(
            lambda x, t: model.apply(params, x, t), ns, model_type="noise")
        # clip_denoised: the procedural data has mass exactly at the +-1
        # clip boundary, so x0 predictions overshoot and low-NFE solvers
        # amplify it into saturated frames (measured: FID no better than
        # the untrained control without this). The reference's pixel-space
        # samplers clip denoised predictions the same way
        # (guided_diffusion clip_denoised=True; correcting_x0_fn hook).
        return build_sampler(
            model_fn, ns, steps=10, order=3, method="multistep",
            skip_type="logSNR",
            correcting_x0_fn=lambda x0, t: jnp.clip(x0, -1.0, 1.0))(x_T)

    jsample = jax.jit(sample_with)
    png_gen = os.path.join(workdir, "png_gen")
    collected = []

    def sample_fn(state, rng):
        x_T = jax.random.normal(rng, (args.sample_batch, side, side, 3))
        out = to_uint8(jsample(state.ema_params, x_T))
        collected.append(out)
        # feed the quantized pixels, matching the PNG path bit-for-bit
        return jnp.asarray(out, jnp.float32) / 255.0 * 2.0 - 1.0

    def harness_feature_fn(images):
        return feature_fn((jnp.asarray(images) + 1.0) / 2.0)

    # ---- path 1: the run_lib.evaluate harness (EvalMeta, rounds, stats) ----
    t0 = time.perf_counter()
    results = run_lib.evaluate(config, workdir=workdir, sample_fn=sample_fn,
                               feature_fn=harness_feature_fn)
    t_eval = time.perf_counter() - t0
    entry = results[args.train_steps]
    print(f"# harness eval: {entry} ({t_eval:.0f}s)", file=sys.stderr,
          flush=True)

    # ---- path 2: the file-based protocol over the SAME samples ----
    gen_u8 = np.concatenate(collected)[: args.n_samples]
    save_pngs(gen_u8, png_gen, "s")
    png_ref = os.path.join(workdir, "png_ref")
    save_pngs(ref_u8, png_ref, "r")
    fid_png = calculate_fid_given_paths([png_gen, png_ref], feature_fn,
                                        batch_size=256)

    # ---- control: untrained model must be much worse ----
    rng0 = jax.random.key(99)
    _, init_fn = run_lib.build_model(config)
    params0 = init_fn(rng0)
    ctrl = []
    for r in range((args.n_samples + args.sample_batch - 1)
                   // args.sample_batch):
        x_T = jax.random.normal(jax.random.fold_in(rng0, r),
                                (args.sample_batch, side, side, 3))
        ctrl.append(to_uint8(jsample(params0, x_T)))
    ctrl_u8 = np.concatenate(ctrl)[: args.n_samples]
    cf = []
    for i in range(0, len(ctrl_u8), 256):
        f, _ = feature_fn(jnp.asarray(ctrl_u8[i:i + 256], jnp.float32) / 255.0)
        cf.append(np.asarray(f))
    fid_ctrl = fid_from_features(np.concatenate(cf), (mu_r, sig_r))

    doc = {
        "protocol": "hermetic train->sample->PNG->Inception->FID loop "
                    "(ref fid_score.py:246-262 / run_lib.py:507-563); "
                    "random-weight Inception — pipeline statistic only",
        "platform": jax.devices()[0].platform,
        "train_steps": args.train_steps,
        "n_samples": int(len(gen_u8)),
        "fid_harness": float(entry["fid"]),
        "inception_score": float(entry["inception_score"]),
        "fid_png_protocol": float(fid_png),
        "fid_untrained_control": float(fid_ctrl),
        "harness_png_agreement": abs(float(entry["fid"]) - float(fid_png)),
        "heldout_eps_mse_trained": loss_trained,
        "heldout_eps_mse_init": loss_init,
        "train_wall_s": round(t_train, 1),
        "eval_wall_s": round(t_eval, 1),
    }
    print(json.dumps(doc))
    if not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
