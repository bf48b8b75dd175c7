"""Fused GEGLU kernel vs the XLA composition at the SD-2.1 FF hot shapes.

Motivation (benchmarks/transformer_profile.py, v5e): the FF stack costs
~70 ms weighted per CFG eval; at the 96px site XLA runs it at ~47 TF/s
actual against a ~1.9 ms compute bound because the (M, 8d) projection
round-trips HBM. This script A/Bs `ops/geglu.py` per site and prints the
dispatch the `geglu_supported` predicate encodes. Flops = 6*M*d*4d
(two gate matmuls + the down-projection), counted directly — XLA cost
analysis cannot see into the Pallas call.

Run on a TPU host: python benchmarks/geglu_bench.py [--batch 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# (side, d) transformer FF sites in the SD-2.1 96px-latent UNet
SITES = [(96, 320), (48, 640), (24, 1280), (12, 1280)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="CFG-doubled batch")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--scan", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.ops.geglu import geglu_ff, geglu_supported

    def sync(o):
        return float(o.ravel()[0])

    def timed(fn, *a, reps=args.reps):
        sync(fn(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / reps

    rows = {}
    for side, d in SITES:
        m = args.batch * side * side
        inner = 4 * d
        rs = np.random.default_rng(0)
        x = jnp.asarray(rs.standard_normal((m, d)) * 0.1, jnp.bfloat16)
        w1 = jnp.asarray(rs.standard_normal((d, 2 * inner)) * 0.02,
                         jnp.float32)
        b1 = jnp.asarray(rs.standard_normal((2 * inner,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rs.standard_normal((inner, d)) * 0.02, jnp.float32)
        b2 = jnp.asarray(rs.standard_normal((d,)) * 0.1, jnp.float32)
        flops = 6 * m * d * inner
        site = {"m": m, "dispatch":
                "pallas" if geglu_supported(m, d, inner) else "xla"}
        res = {}
        for name, force in (("xla", False), ("pallas", True)):
            fn = jax.jit(lambda x0, w1, b1, w2, b2, f=force: jax.lax.scan(
                lambda c, _: (geglu_ff(c, w1, b1, w2, b2, f).astype(c.dtype),
                              None), x0, None, length=args.scan)[0])
            try:
                dt = timed(fn, x, w1, b1, w2, b2) / args.scan
                res[name] = fn(x, w1, b1, w2, b2)
                site[name] = {"ms": round(dt * 1e3, 2),
                              "tflops_s": round(flops / dt / 1e12, 1)}
            except Exception as e:  # noqa: BLE001 - keep surveying shapes
                site[name] = f"FAILED: {type(e).__name__}: " \
                             f"{str(e).splitlines()[0][:100]}"
        if isinstance(site.get("xla"), dict) and isinstance(
                site.get("pallas"), dict):
            site["speedup"] = round(site["xla"]["ms"] / site["pallas"]["ms"],
                                    2)
            site["max_abs_diff"] = float(jnp.max(jnp.abs(
                res["xla"].astype(jnp.float32)
                - res["pallas"].astype(jnp.float32))))
        rows[f"{side}px_d{d}"] = site
        print(f"# {side}px d{d}: {site}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "sd21_geglu_ff_ab", "batch": args.batch,
                      "platform": jax.devices()[0].platform, "sites": rows}))


if __name__ == "__main__":
    main()
