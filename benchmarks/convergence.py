"""Reference convergence protocol at full model size (README.md:242-258).

The reference's prescribed correctness check: "first run 1000-step DDIM to get
the 'ground truth' sample for a fixed x_T; DPM-Solver with 10-20 NFE converges
to the same sample". No trained weights are needed for the *solver* claim —
the probability-flow ODE of ANY weight setting is a well-defined ODE, and
the protocol measures how fast each method converges to its exact solution
at full model size (35.7M CIFAR DDPM UNet, 32x32x3), in fp32 with HIGHEST
matmul precision so the comparison floor is set by the solver, not the
MXU's bf16 passes.

By default the UNet is briefly trained on an in-repo procedural dataset
(`--train-steps`, hermetic — no external checkpoint): a purely random-init
UNet produces a rough, non-smooth eps(x, t) field on which high-order
multistep methods lose their asymptotic advantage (measured: 3M@10NFE ~
DDIM@15NFE with random weights), whereas the reference protocol assumes the
smooth score field of a trained model. A briefly-trained net restores that
smoothness; `--train-steps 0` reproduces the random-weight variant.

Ground truth: DPM-Solver order-1 multistep on the 1000-point uniform discrete
grid, which IS 1000-step deterministic DDIM (the order-1 update is the DDIM
update, ref dpm_solver_pytorch.py:549 "equivalent to DDIM"; trajectory-level
DDIM parity vs torch `generalized_steps` is separately established in
tests/test_sde_samplers.py). Using the solver's own order-1 path keeps the
terminal time (t_0 = 1/N) identical across GT and candidates, so the metric
is pure solver error with no endpoint-semantics mismatch.

Candidates: the canonical BASELINE configurations (DPM-Solver++ 3M/2M at
10/20 NFE, singlestep order-3) plus a DDIM ladder (10..250 NFE) showing the
baseline's own convergence rate — the paper's headline is that 10-20 NFE of
DPM-Solver lands where DDIM needs hundreds of steps.

Run:  python benchmarks/convergence.py            (real chip, full size)
      python benchmarks/convergence.py --cpu --tiny --gt-steps 199  (smoke)

Prints one JSON document (consumed by QUALITY_r2.json).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _sync(out):
    import jax

    return float(jax.tree.leaves(out)[0].ravel()[0])


def pixel(v):
    v = (np.asarray(v, np.float64) + 1.0) / 2.0
    return np.clip(v, 0.0, 1.0) * 255.0


def metrics_vs(x, gt):
    d = np.abs(np.asarray(x, np.float64) - np.asarray(gt, np.float64))
    dp = np.abs(pixel(x) - pixel(gt))
    return {
        "max_abs": float(d.max()),
        "rmse": float(np.sqrt((d ** 2).mean())),
        "pixel_mean_abs": float(dp.mean()),
        "pixel_max_abs": float(dp.max()),
        "pixel_frac_within_1": float((dp <= 1.0).mean()),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--gt-steps", type=int, default=999,
                   help="ground-truth DDIM steps (999 == the full 1000-point "
                        "discrete grid)")
    p.add_argument("--train-steps", type=int, default=2000,
                   help="brief hermetic training of the full-size UNet on "
                        "procedural data (0 = random weights)")
    p.add_argument("--train-batch", type=int, default=128)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig
    from dpm_solver_tpu.solver import jit_hoisting_constants

    cfg = get_config("tiny_test" if args.tiny else "cifar10_ddpm")
    mc = cfg.model_config if args.tiny else DDPMUNetConfig.cifar10()
    side = cfg.data.image_size
    model = DDPMUNet(mc)  # fp32 compute
    t0 = time.perf_counter()
    if args.train_steps > 0:
        import tempfile

        from benchmarks.hermetic_fid import make_synthetic
        from dpm_solver_tpu import run_lib

        train_set = make_synthetic(8192, side, seed=0)
        rng = np.random.default_rng(1)

        def data_iter():
            while True:
                yield train_set[rng.integers(0, len(train_set),
                                             args.train_batch)]

        state = run_lib.train(cfg, data_iter(),
                              workdir=tempfile.mkdtemp(prefix="conv_"),
                              max_steps=args.train_steps)
        # raw params, not EMA: at 2k steps the config's 0.9999-decay EMA
        # still carries ~0.82 of the random init
        params = state.params
        print(f"# trained {args.train_steps} steps "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)
    else:
        params = jax.jit(model.init)(jax.random.key(0),
                                     jnp.zeros((1, side, side, 3)),
                                     jnp.zeros((1,)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# model: {n_params/1e6:.1f}M params ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    ns = NoiseScheduleVP.discrete(betas=cfg.diffusion.betas())
    raw = lambda x, t: model.apply(params, x, t)
    model_fn = model_wrapper(raw, ns, model_type="noise")

    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, side, side, 3)), jnp.float32)

    def run(**kw):
        fn = jit_hoisting_constants(
            build_sampler(model_fn, ns, **kw), x_T)
        t0 = time.perf_counter()
        out = fn(x_T)
        _sync(out)
        return np.asarray(out), time.perf_counter() - t0

    # ---- ground truth: 1000-step DDIM (order-1 on the full uniform grid) ----
    gt, t_gt = run(steps=args.gt_steps, order=1, method="multistep",
                   skip_type="time_uniform")
    print(f"# ground truth: DDIM {args.gt_steps} steps ({t_gt:.1f}s incl. "
          "compile)", file=sys.stderr, flush=True)

    candidates = {
        "dpmsolver++_3M_10nfe_logSNR": dict(
            steps=10, order=3, method="multistep", skip_type="logSNR"),
        "dpmsolver++_3M_20nfe_logSNR": dict(
            steps=20, order=3, method="multistep", skip_type="logSNR"),
        "dpmsolver++_2M_10nfe_time_uniform": dict(
            steps=10, order=2, method="multistep", skip_type="time_uniform"),
        "dpmsolver++_2M_20nfe_time_uniform": dict(
            steps=20, order=2, method="multistep", skip_type="time_uniform"),
        "dpmsolver++_S3_10nfe_logSNR": dict(
            steps=10, order=3, method="singlestep", skip_type="logSNR"),
        "dpmsolver_3M_10nfe_logSNR": dict(
            steps=10, order=3, method="multistep", skip_type="logSNR",
            algorithm_type="dpmsolver"),
        "unipc_3_10nfe_logSNR": dict(
            steps=10, order=3, method="unipc", skip_type="logSNR"),
        "unipc_2_10nfe_time_uniform": dict(
            steps=10, order=2, method="unipc", skip_type="time_uniform"),
        "dpmsolver++_2M_10nfe_karras": dict(
            steps=10, order=2, method="multistep", skip_type="karras"),
        "unipc_3_10nfe_karras": dict(
            steps=10, order=3, method="unipc", skip_type="karras"),
        "ddim_10nfe": dict(steps=10, order=1, method="multistep",
                           skip_type="time_uniform"),
        "ddim_20nfe": dict(steps=20, order=1, method="multistep",
                           skip_type="time_uniform"),
        "ddim_50nfe": dict(steps=50, order=1, method="multistep",
                           skip_type="time_uniform"),
        "ddim_100nfe": dict(steps=100, order=1, method="multistep",
                            skip_type="time_uniform"),
        "ddim_250nfe": dict(steps=250, order=1, method="multistep",
                            skip_type="time_uniform"),
    }
    if args.tiny:  # smoke path: keep it short
        candidates = {k: v for k, v in candidates.items()
                      if "250" not in k and "100" not in k}

    results = {}
    for name, kw in candidates.items():
        out, dt = run(**kw)
        results[name] = metrics_vs(out, gt)
        results[name]["wall_s"] = round(dt, 2)
        print(f"# {name}: max|d|={results[name]['max_abs']:.3e} "
              f"rmse={results[name]['rmse']:.3e} "
              f"pix<=1: {results[name]['pixel_frac_within_1']*100:.2f}%",
              file=sys.stderr, flush=True)

    doc = {
        "protocol": "reference README.md:242-258 — 1000-step DDIM ground "
                    "truth vs low-NFE DPM-Solver, same x_T, fixed random "
                    "weights, fp32/HIGHEST",
        "model": f"ddpm_unet {n_params/1e6:.1f}M, {side}x{side}x3, "
                 f"batch {args.batch}",
        "platform": jax.devices()[0].platform,
        "gt": f"ddim_{args.gt_steps}steps",
        "results": results,
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
