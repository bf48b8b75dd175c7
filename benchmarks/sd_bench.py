"""SD-2.1-class serving benchmark: 20-NFE CFG sampling throughput per chip.

Reproduces the README's serving-envelope numbers: the full text-to-image
latent path — CFG-doubled 866M-param SD-2.1 UNet (v-prediction), 20-step
DPM-Solver++(2M) as ONE compiled XLA program, then the VAE decode — with
random weights (throughput is weight-independent) at the given batch size.

The BASELINE target is >=2x diffusers samples/sec/chip for SD-2.1 @ 20
NFE on v5e-8. diffusers is not installed in this image, so the in-repo
A/B (`vs_baseline`) is a reference-style per-step driver over the SAME
UNet/VAE: one jitted UNet-eval+solver-update program dispatched once per
NFE, plus a separate jitted VAE decode — how torch/diffusers execute a
sampling loop (scheduler step per launch, no cross-step compilation).
Dispatches are enqueued asynchronously with a single terminal sync, so the
baseline is not penalized for tunnel round-trips. The absolute
samples/s/chip number is recorded for the external diffusers comparison.

Both numbers carry roofline fields (CLAUDE.md discipline): `flops` is the
XLA cost-analysis count of the per-step program x NFE (+ VAE), and
`mfu` = flops / wall / 197 TF/s (v5e bf16 peak).

Run on a TPU host: python benchmarks/sd_bench.py [--batch 4] [--steps 20]
(~10-20 min: the big XLA compiles dominate; add --latent 32 --tiny --cpu
for a quick structural smoke run.)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def sync(out):
    """Device-side scalar fetch: block_until_ready does not block through
    the tunneled axon backend (see CLAUDE.md)."""
    import jax

    return float(jax.tree.leaves(out)[0].ravel()[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--latent", type=int, default=96,
                   help="latent side (96 = 768px SD-2.1 native; use small "
                        "values for structural smoke runs)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip-vae", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="replace the 866M UNet with a structurally identical "
                        "small one (CPU smoke runs; numbers meaningless)")
    p.add_argument("--quant", choices=["w8a8", "w8a8_conv"], default=None,
                   help="int8 dynamic-quantized transformer stack "
                        "(ops/quant.py); A/B against the default bf16 run "
                        "from the same session")
    p.add_argument("--weights", choices=["fp32", "bf16"], default="fp32",
                   help="parameter storage dtype for UNet+VAE. bf16 halves "
                        "weight HBM residency (3.46 GB -> 1.73 GB for the "
                        "866M UNet) and removes the fp32->bf16 convert "
                        "temps the batch-8 OOM dump showed; norm statistics "
                        "stay fp32 (GroupNorm32 upcasts scale/bias). Ships "
                        "with a full-trajectory quality gate vs fp32 "
                        "weights, like --quant.")
    p.add_argument("--trace-dir", default=None,
                   help="capture an XProf trace of one warm pipe "
                        "execution (parse with benchmarks/trace_summary.py)")
    p.add_argument("--baseline-xla", action="store_true",
                   help="compile the per-step baseline with ALL Pallas "
                        "dispatch forced to XLA — the faithful stand-in "
                        "for stock flax/diffusers on this chip (which has "
                        "none of this repo's kernels). Without it the "
                        "baseline reuses our fast compiled eval and only "
                        "measures orchestration overhead.")
    args = p.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/dpm_solver_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu.models import ADMConfig, ADMUNet
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
    from dpm_solver_tpu.pipelines import make_ldm_betas

    import dataclasses

    ucfg = ADMConfig.sd_v2_1()
    if args.tiny:
        # model_channels must stay a multiple of num_head_channels=64
        ucfg = dataclasses.replace(ucfg, model_channels=64,
                                   num_res_blocks=1, channel_mult=(1, 2))
    if args.quant:
        ucfg = dataclasses.replace(ucfg, quant=args.quant)
    unet = ADMUNet(config=ucfg, compute_dtype=jnp.bfloat16)
    ctx = jnp.zeros((2 * args.batch, 77, ucfg.context_dim), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(lambda r: unet.init(
        r, jnp.zeros((1, args.latent, args.latent, 4)), jnp.ones((1,)),
        None, ctx[:1], deterministic=True))(jax.random.key(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# unet init: {n_params/1e6:.0f}M params, "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    def cast_weights(tree):
        if args.weights != "bf16":
            return tree
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)

    raw_params = params  # uncast fp32 originals for the quality gate
    params = cast_weights(params)

    ns = NoiseScheduleVP.discrete(betas=make_ldm_betas())
    cond, uncond = ctx[: args.batch], ctx[args.batch:]
    model_fn = model_wrapper(
        lambda x, t, c: unet.apply(params, x, t, None, c,
                                   deterministic=True),
        ns, model_type="v", guidance_type="classifier-free",
        condition=cond, unconditional_condition=uncond,
        guidance_scale=args.scale)
    fn = build_sampler(model_fn, ns, steps=args.steps, order=2,
                       method="multistep", skip_type="time_uniform")

    # hoist the 866M closed-over params into jit ARGUMENTS (see
    # solver/sample.py _jit_hoisting_constants: closure constants embed
    # ~3.7 GB of weights into the lowered HLO otherwise)
    from dpm_solver_tpu.solver import jit_hoisting_constants

    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, args.latent, args.latent, 4)), jnp.float32)

    if args.skip_vae:
        pipe = jit_hoisting_constants(fn, x_T)
    else:
        vcfg = VAEConfig.sd_v1()
        if args.quant:
            vcfg = dataclasses.replace(vcfg, quant=args.quant)
        vae = AutoencoderKL(config=vcfg, dtype=jnp.bfloat16)
        raw_vae_params = jax.jit(lambda r: vae.init(
            r, jnp.zeros((1, 8 * args.latent, 8 * args.latent, 3))))(
                jax.random.key(1))
        vae_params = cast_weights(raw_vae_params)
        print("# vae init done", file=sys.stderr, flush=True)

        def pipe_fn(x_T):
            z = fn(x_T)
            return vae.apply(vae_params, z / 0.18215,
                             method=AutoencoderKL.decode)

        pipe = jit_hoisting_constants(pipe_fn, x_T)

    t0 = time.perf_counter()
    sync(pipe(x_T))
    print(f"# compile+warm: {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    if args.trace_dir:
        # XProf capture of ONE warm pipe execution (compile/warm above is
        # outside the capture). Summarize with benchmarks/trace_summary.py
        # — the measurement results_roofline_v5e.json's analytic
        # structural_roundtrips table is reconciled against.
        with jax.profiler.trace(args.trace_dir):
            sync(pipe(x_T))
        print(f"# trace written to {args.trace_dir}", file=sys.stderr,
              flush=True)
    t0 = time.perf_counter()
    out = None
    for _ in range(args.reps):
        out = pipe(x_T)
    sync(out)
    dt = (time.perf_counter() - t0) / args.reps

    # ---- reference-style per-step driver over the SAME UNet/VAE ----------
    # One jitted program per NFE (UNet CFG eval + DPM-Solver++(2M) update),
    # dispatched from a Python loop — the execution shape of the torch
    # reference (dpm_solver_pytorch.py:1171-1213 drives one model call per
    # step) and of diffusers schedulers. AOT-compiled so the loop pays
    # dispatch, not tracing.
    from dpm_solver_tpu.solver.plan import build_multistep_plan

    plan = build_multistep_plan(ns, args.steps, 2, skip_type="time_uniform")
    r = plan.scan_rows
    rows_dev = [jnp.asarray([float(r.a[i]), float(r.b[i][0]),
                             float(r.b[i][1]), float(r.t_next[i]),
                             float(r.alpha_next[i]), float(r.sigma_next[i])],
                            jnp.float32) for i in range(r.n_ops)]
    tr = plan.tail_rows
    tail_dev = jnp.asarray([float(tr.a[0]), float(tr.b[0][0]),
                            float(tr.b[0][1]), 0.0, 0.0, 0.0], jnp.float32)
    row0 = jnp.asarray([1.0, 0.0, 0.0, plan.t_first, plan.alpha_first,
                        plan.sigma_first], jnp.float32)

    def make_model_fn(p):
        return model_wrapper(
            lambda x, t, c: unet.apply(p, x, t, None, c, deterministic=True),
            ns, model_type="v", guidance_type="classifier-free",
            condition=cond, unconditional_condition=uncond,
            guidance_scale=args.scale)

    def step_impl(p, x, h0, h1, row):
        x_new = row[0] * x + row[1] * h0 + row[2] * h1
        eps = make_model_fn(p)(x_new, row[3])
        x0 = (x_new - row[5] * eps) / row[4]     # ++ combines x0 predictions
        return x_new, x0

    zz = jnp.zeros_like(x_T)
    if args.baseline_xla:
        from benchmarks.roofline import forced_xla

        with forced_xla():
            jstep = jax.jit(step_impl).lower(params, x_T, zz, zz,
                                             row0).compile()
            if not args.skip_vae:
                jdecode = jax.jit(
                    lambda vp, z: vae.apply(vp, z / 0.18215,
                                            method=AutoencoderKL.decode)
                ).lower(vae_params, x_T).compile()
    else:
        jstep = jax.jit(step_impl).lower(params, x_T, zz, zz, row0).compile()
        if not args.skip_vae:
            jdecode = jax.jit(
                lambda vp, z: vae.apply(vp, z / 0.18215,
                                        method=AutoencoderKL.decode)
            ).lower(vae_params, x_T).compile()
    jcombine = jax.jit(
        lambda x, h0, h1, row: row[0] * x + row[1] * h0 + row[2] * h1
    ).lower(x_T, zz, zz, tail_dev).compile()

    def cost_flops(compiled):
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        try:
            return float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001 — backend without cost analysis
            return 0.0

    def baseline_pipe(x):
        h0 = h1 = zz
        _, h0 = jstep(params, x, h0, h1, row0)
        for rr in rows_dev:
            x, m = jstep(params, x, h0, h1, rr)
            h0, h1 = m, h0
        x = jcombine(x, h0, h1, tail_dev)
        if not args.skip_vae:
            x = jdecode(vae_params, x)
        return x

    t0 = time.perf_counter()
    sync(baseline_pipe(x_T))
    print(f"# baseline compile+warm: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = None
    for _ in range(args.reps):
        out = baseline_pipe(x_T)
    sync(out)
    dt_base = (time.perf_counter() - t0) / args.reps

    # roofline accounting: XLA cost analysis counts a scan body once, so
    # total flops = per-step program x NFE (same arithmetic in both drivers)
    flops = args.steps * cost_flops(jstep) + cost_flops(jcombine)
    if not args.skip_vae:
        flops += cost_flops(jdecode)
    # timing is printed BEFORE the quality gate: the gate instantiates a
    # second param set + two extra pipes and can RESOURCE_EXHAUST at big
    # batch — a gate failure must not lose the measurement
    plat = jax.devices()[0].platform
    peak = None if plat == "cpu" else 197e12  # v5e bf16
    sps = args.batch / dt
    tfs = flops / dt / 1e12
    print(f"# ours {dt*1e3:.0f} ms/batch ({dt*1e3/args.batch:.0f} ms/image, "
          f"{tfs:.1f} TF/s) | per-step baseline {dt_base*1e3:.0f} ms/batch "
          f"({flops/dt_base/1e12:.1f} TF/s)", file=sys.stderr, flush=True)

    # ---- int8 trajectory-quality gate (VERDICT r2 item 3): same params,
    # same x_T, full 20-NFE trajectory through the FLOAT stack — the
    # speed number must travel with its end-to-end quality cost, not just
    # the per-op deviation ----------------------------------------------
    quality = None
    if args.quant or args.weights == "bf16":
        # perturb every leaf: random-init UNets have zero-init output
        # projections (eps == 0 -> identical trajectories, vacuous gate);
        # quant_bench.py uses the same trick. Perturbation happens on the
        # UNCAST fp32 originals so the fp32-weights control arm is exact.
        fp32_params = raw_params
        qparams = jax.jit(lambda p, r: jax.tree.map(
            lambda a, k: a + 0.02 * jax.random.normal(k, a.shape, a.dtype),
            p, jax.tree.unflatten(jax.tree.structure(p),
                                  list(jax.random.split(
                                      r, len(jax.tree.leaves(p)))))))(
            fp32_params, jax.random.key(7))

        # the gate compares per-image trajectories, so batch 4 suffices —
        # and at batch 8 BOTH param sets + two pipes' buffers resident
        # together RESOURCE_EXHAUST the chip (the fp32-weights b8 program
        # alone already runs within ~2 GB of HBM capacity,
        # results_sd_stage_profile_b8_v5e.json)
        gate_bs = min(args.batch, 4)
        gx_T, gcond, guncond = x_T[:gate_bs], cond[:gate_bs], uncond[:gate_bs]

        def make_pipe(quant_mode, wp, vp):
            net = ADMUNet(config=dataclasses.replace(ucfg, quant=quant_mode),
                          compute_dtype=jnp.bfloat16)
            mf = model_wrapper(
                lambda x, t, c: net.apply(wp, x, t, None, c,
                                          deterministic=True),
                ns, model_type="v", guidance_type="classifier-free",
                condition=gcond, unconditional_condition=guncond,
                guidance_scale=args.scale)
            smp = build_sampler(mf, ns, steps=args.steps, order=2,
                                method="multistep", skip_type="time_uniform")
            if args.skip_vae:
                return jit_hoisting_constants(smp, gx_T)
            dec = AutoencoderKL(
                config=dataclasses.replace(vcfg, quant=quant_mode),
                dtype=jnp.bfloat16)

            def pf(x):
                return dec.apply(vp, smp(x) / 0.18215,
                                 method=AutoencoderKL.decode)

            return jit_hoisting_constants(pf, gx_T)

        vp_fp32 = None if args.skip_vae else raw_vae_params
        if args.quant:
            a = np.asarray(make_pipe(args.quant, qparams, vp_fp32)(gx_T),
                           np.float64)
        else:  # bf16-weights arm vs the fp32-weights control
            qp_bf16 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, qparams)
            a = np.asarray(
                make_pipe(None, qp_bf16,
                          None if args.skip_vae else vae_params)(gx_T),
                np.float64)
        b = np.asarray(make_pipe(None, qparams, vp_fp32)(gx_T), np.float64)
        space = "latent" if args.skip_vae else "decoded [-1,1]"
        quality = {
            "space": space,
            "rmse": float(np.sqrt(np.mean((a - b) ** 2))),
            "max_abs": float(np.max(np.abs(a - b))),
            "rel_rmse": float(np.sqrt(np.mean((a - b) ** 2))
                              / (np.sqrt(np.mean(b ** 2)) + 1e-12)),
        }
        if not args.skip_vae:
            quality["pixel_rmse_0_255"] = round(quality["rmse"] * 127.5, 3)
            quality["pixel_frac_within_1"] = float(
                np.mean(np.abs(a - b) * 127.5 <= 1.0))
        mode = args.quant or "bf16 weights"
        print(f"# {mode} quality vs fp32-weights ({space}): rmse "
              f"{quality['rmse']:.5f}, rel {quality['rel_rmse']:.4f}",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": (f"sd21_{args.steps}nfe_cfg_samples_per_sec_per_chip"
                   + (f"_{args.quant}" if args.quant else "")
                   + ("_wbf16" if args.weights == "bf16" else "")),
        "quant": args.quant,
        "weights": args.weights,
        "value": round(sps, 3),
        "unit": "samples/s",
        "vs_baseline": round(dt_base / dt, 3),
        "baseline": "per_step_driver_same_nets",
        "baseline_samples_per_sec": round(args.batch / dt_base, 3),
        "batch": args.batch,
        "latent": args.latent,
        "vae_decode": not args.skip_vae,
        "flops_per_batch": flops,
        "implied_tflops": round(tfs, 2),
        "mfu": round(flops / dt / peak, 4) if peak else None,
        "quality_vs_float": quality,
    }))


if __name__ == "__main__":
    main()
