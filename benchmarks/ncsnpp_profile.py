"""NCSN++ forward-eval ablation profile (the score_sde bench is model-bound).

score_sde_bench measures exact solver-layer parity with the reference (both
drive the identical NCSN++), so beating it requires a faster MODEL eval.
This script times the deep CIFAR NCSN++ forward under ablations — dtype,
attention on/off, block count, resblock type — with XLA cost-analysis flops
per variant, to locate where the 10-NFE budget actually goes before
optimizing. K-scan amortized timing, device-side scalar sync (CLAUDE.md).

Run on a TPU host: python benchmarks/ncsnpp_profile.py [--batch 256]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

K = 10


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.models import NCSNpp, NCSNppConfig

    base = NCSNppConfig.cifar10_ddpmpp(deep=True)
    variants = {
        "fp32": (base, jnp.float32),
        "bf16": (base, jnp.bfloat16),
        "fp32_noattn": (dataclasses.replace(base, attn_resolutions=()),
                        jnp.float32),
        "bf16_noattn": (dataclasses.replace(base, attn_resolutions=()),
                        jnp.bfloat16),
    }

    side = base.image_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, side, side, 3)), jnp.float32)
    t = jnp.linspace(1.0, 999.0, args.batch)

    rows = {}
    for name, (cfg, dt) in variants.items():
        model = NCSNpp(config=cfg, compute_dtype=dt)
        params = jax.jit(lambda r, m=model: m.init(
            r, x[:1], t[:1], deterministic=True))(jax.random.key(0))

        # params as jit ARGUMENTS: as closure constants the 107M weights
        # embed in the HLO and blow the tunnel's remote-compile payload
        # limit (HTTP 413) — see CLAUDE.md / jit_hoisting_constants
        def eval_fn(pp, xx, m=model):
            return m.apply(pp, xx, t, deterministic=True)

        jrun = jax.jit(lambda pp, xx: jax.lax.scan(
            lambda c, _: (eval_fn(pp, c).astype(jnp.float32), None),
            xx, None, length=K)[0])
        # ONE compile serves timing and cost analysis: XLA counts the scan
        # body once, so the program's flops ~= one eval's
        compiled = jrun.lower(params, x).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", 0.0))
            tbytes = float(ca.get("bytes accessed", 0.0))
        except Exception:  # noqa: BLE001
            flops, tbytes = 0.0, 0.0
        float(compiled(params, x).ravel()[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = compiled(params, x)
        float(out.ravel()[0])
        dt_s = (time.perf_counter() - t0) / args.reps / K
        rows[name] = {
            "ms_per_eval": round(dt_s * 1e3, 2),
            "flops": flops,
            "tflops_s": round(flops / dt_s / 1e12, 1),
            "hbm_gbps": round(tbytes / dt_s / 1e9, 1),
        }
        print(f"# {name}: {rows[name]}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "ncsnpp_eval_ablation",
                      "batch": args.batch,
                      "platform": jax.devices()[0].platform,
                      "variants": rows}))


if __name__ == "__main__":
    main()
