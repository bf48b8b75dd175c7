"""ImageNet64 i-DDPM sampling at full model size on one chip.

The canonical ImageNet64 configuration (ddpm_and_guided-diffusion/
sample.sh:19-33 + configs/imagenet64.yml): improved-DDPM UNet (cosine
4000-step schedule, learned sigma -> mean split like the reference runner,
runners/diffusion.py:600-603), DPM-Solver++ multistep order 3, 10 NFE,
logSNR grid, sampling batch 500 per device (imagenet64.yml:42). This fills
the one canonical sample.sh config missing from results_canonical_v5e.json.

Both arms drive the IDENTICAL flax i-DDPM port in the same session:
ours = one-program lax.scan trajectory; baseline = the reference's own JAX
solver (/root/reference/dpm_solver_jax.py) over the same net. Random
weights (throughput is weight-independent).

Run on a TPU host: python benchmarks/imagenet64_bench.py [--batch 500]
(--tiny --cpu for a structural smoke run).
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=500,
                   help="per-device sampling batch (imagenet64.yml:42)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--no-reference-arm", action="store_true")
    p.add_argument("--arm", choices=("both", "ours", "ref"), default="both",
                   help="run one arm per process: the reference arm's "
                        "INTERNAL backend error (2026-08-20, twice) wedges "
                        "the client for everything after it, so ours + "
                        "cost analysis must not share its process")
    args = p.parse_args()
    if args.no_reference_arm:
        args.arm = "ours"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.models import ADMUNet
    from dpm_solver_tpu.solver import jit_hoisting_constants

    config = get_config("imagenet64_iddpm")
    mc = config.model_config
    if args.tiny:
        mc = dataclasses.replace(
            mc, image_size=16, model_channels=32, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2)
    side = mc.image_size

    unet = ADMUNet(config=mc, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = jax.jit(lambda r: unet.init(
        r, jnp.zeros((1, side, side, 3)), jnp.ones((1,)), None, None,
        deterministic=True))(jax.random.key(0))
    n_p = sum(x.size for x in jax.tree.leaves(params))
    print(f"# iDDPM unet {n_p/1e6:.0f}M params "
          f"({time.perf_counter()-t0:.0f}s init)", file=sys.stderr, flush=True)

    betas = config.diffusion.betas()  # cosine, 4000 steps
    ns = NoiseScheduleVP.discrete(betas=betas)

    def raw(x, t):
        out = unet.apply(params, x, t, None, None, deterministic=True)
        return out[..., :3]  # learned-sigma: mean split (ref :600-603)

    model_fn = model_wrapper(raw, ns, model_type="noise")
    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, side, side, 3)), jnp.float32)

    def sync(o):
        return float(o.ravel()[0])

    dt = flops = None
    if args.arm in ("both", "ours"):
        fn = build_sampler(model_fn, ns, steps=args.steps, order=3,
                           method="multistep", skip_type="logSNR")
        jfn = jit_hoisting_constants(fn, x_T)
        t0 = time.perf_counter()
        out0 = jfn(x_T)
        sync(out0)
        print(f"# compile+warm {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        assert np.isfinite(np.asarray(out0[:2])).all(), "non-finite samples"
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = jfn(x_T)
        sync(out)
        dt = (time.perf_counter() - t0) / args.reps
        # fence: print the ours measurement BEFORE anything else can fail
        # (the first run lost a 4-min measurement to an INTERNAL backend
        # error inside the reference arm's warm-up)
        print(f"# ours: {dt*1e3:.0f} ms/batch", file=sys.stderr, flush=True)
        del out0, out

        # flops: XLA cost analysis of one model eval (no Pallas inside the
        # 64px ADM trunk at these shapes; attention sites are 16/8px)
        try:
            c = jax.jit(lambda pp, xx, tt: unet.apply(
                pp, xx, tt, None, None, deterministic=True)).lower(
                    params, x_T, jnp.ones((args.batch,))).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = args.steps * float(ca.get("flops", 0.0))
        except Exception as e:  # noqa: BLE001
            print(f"# cost analysis unavailable: {e}", file=sys.stderr)
            flops = 0.0

    # ---- reference arm: the reference's own JAX solver over the SAME net.
    # Params travel as jit ARGUMENTS (closure constants would embed the
    # weights as HLO and bloat the tunnel's remote-compile payload).
    dt_ref = None
    if args.arm in ("both", "ref"):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "reference_dpm_solver_jax", "/root/reference/dpm_solver_jax.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        ns_ref = ref.NoiseScheduleVP(
            "discrete", betas=jnp.asarray(betas, jnp.float32))

        def ref_run(x, pp):
            mf = ref.model_wrapper(
                lambda xx, tt: unet.apply(
                    pp, xx, tt, None, None, deterministic=True)[..., :3],
                ns_ref, model_type="noise")
            solver = ref.DPM_Solver(mf, ns_ref, predict_x0=True)
            return solver.sample(
                x, steps=args.steps, order=3, skip_type="logSNR",
                method="multistep", t_start=jnp.asarray(1.0),
                t_end=jnp.asarray(1e-3))

        jref = jax.jit(ref_run)
        try:
            t0 = time.perf_counter()
            ref0 = jref(x_T, params)
            sync(ref0)
            print(f"# reference arm compile+warm "
                  f"{time.perf_counter()-t0:.0f}s", file=sys.stderr,
                  flush=True)
            assert np.isfinite(np.asarray(ref0[:2])).all()
            del ref0
            t0 = time.perf_counter()
            ro = None
            for _ in range(args.reps):
                ro = jref(x_T, params)
            sync(ro)
            dt_ref = (time.perf_counter() - t0) / args.reps
            print(f"# reference arm: {dt_ref*1e3:.0f} ms/batch",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — keep the ours row
            print(f"# reference arm FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # merge arms into per-batch rows (each arm may come from its own
    # process — the reference arm INTERNALs at batch 500, see --arm help)
    peak = None if jax.devices()[0].platform == "cpu" else 197e12
    path = __file__.rsplit("/", 1)[0] + "/results_imagenet64_v5e.json"
    doc = {"metric": (f"imagenet64_iddpm_{args.steps}nfe_"
                      "samples_per_sec_per_chip"),
           "unit": "samples/s", "image_size": side, "rows": {}}
    if not args.cpu:
        try:
            with open(path) as f:
                prev = json.load(f)
            doc["rows"] = prev.get("rows", {})
        except Exception:  # noqa: BLE001
            pass
    row = doc["rows"].setdefault(str(args.batch), {})
    if dt is not None:
        tfs = (flops or 0.0) / dt / 1e12
        print(f"# {dt*1e3:.0f} ms/batch of {args.batch} "
              f"({args.batch/dt:.1f} samples/s, {tfs:.1f} TF/s)",
              file=sys.stderr)
        row.update({
            "samples_per_sec": round(args.batch / dt, 2),
            "ms_per_batch": round(dt * 1e3, 1),
            "flops_per_batch": flops,
            "implied_tflops": round(tfs, 2),
            "mfu": round(flops / dt / peak, 4) if peak else None,
        })
    if dt_ref is not None:
        ours_ms = row.get("ms_per_batch")
        row.update({
            "vs_baseline": (round(dt_ref * 1e3 / ours_ms, 3)
                            if ours_ms else None),
            "baseline": "reference_dpm_solver_jax, same iDDPM port"
                        + (", same session" if args.arm == "both" else ""),
            "baseline_ms_per_batch": round(dt_ref * 1e3, 1),
        })
    # headline = the canonical batch-500 ours row (imagenet64.yml:42);
    # if batch 500 has not been measured, the headline labels the batch
    # it actually comes from
    head_batch = "500" if "500" in doc["rows"] else str(args.batch)
    head = doc["rows"].get(head_batch, row)
    doc.update({"value": head.get("samples_per_sec"),
                "batch": int(head_batch),
                "vs_baseline": next(
                    (r["vs_baseline"] for r in doc["rows"].values()
                     if r.get("vs_baseline")), None)})
    if not args.cpu and row:
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
