"""A/B the attention forward variants at the SD hot shapes.

The flash kernel at SD-2.1@768px's (40, 9216, 64) self-attention runs at
63 TF/s against a ~98 TF/s d=64 ceiling (results_attn_sweep_9216_v5e.json)
— the last mapped headroom on the SD pipe (CHIP_TODO round-4 item 2). Two
variants attack the non-MXU time:

  rowsum   v is augmented with a ones column so the softmax denominator
           falls out of the p@v matmul as column d (d=64 leaves half the
           MXU output lanes idle — the extra column is free); the VPU
           row-sum pass and the l scratch disappear.
  sb16     exp2 computed on bf16 after the exact f32 max-subtract: half
           the VPU transcendental bytes and no separate p->bf16 cast
           before the MXU.

Timed with benchmarks/_timing.chain_time (the tunnel's per-dispatch
overhead biases per-call A/Bs of sub-10 ms kernels toward 1.0; these
kernels are 3-14 ms). Numerics: max|diff| vs the f32 XLA composition per
arm; the wiring gate is the full-trajectory parity suite, not this.

Run on a TPU host:  python benchmarks/attn_variants_bench.py
Output: one JSON line -> redirect to results_attn_variants_v5e.json.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode smoke on CPU (no timing value)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    from benchmarks._timing import chain_time

    enable_compile_cache()
    from dpm_solver_tpu.ops.attention import (
        attention_xla,
        flash_attention,
        fused_attention,
    )

    interp = args.cpu
    # (site, kernel, (bh, t, d), block_q, block_k) — the two measured SD
    # self-attention regimes (sweeps: results_attn_sweep_{9216,2304}_v5e).
    sites = [
        ("sd768_self", "flash", (40, 9216, 64), 1024, 1024),
        ("sd48px_self", "panel", (80, 2304, 64), 768, None),
    ]
    if args.cpu:  # interpret mode is ~1000x slower: smoke on tiny twins
        sites = [
            ("sd768_self", "flash", (2, 512, 64), 128, 256),
            ("sd48px_self", "panel", (2, 384, 64), 128, None),
        ]
    variants = [
        ("base", dict(mxu_rowsum=False, softmax_bf16=False)),
        ("rowsum", dict(mxu_rowsum=True, softmax_bf16=False)),
        ("sb16", dict(mxu_rowsum=False, softmax_bf16=True)),
        ("rowsum_sb16", dict(mxu_rowsum=True, softmax_bf16=True)),
    ]

    rows = {}
    best = {}
    for site, kind, (bh, t, d), bq, bk in sites:
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        flops = 4 * bh * t * t * d
        # chunk the reference over bh: the XLA composition materializes the
        # full (chunk, t, t) f32 logits (13.6 GB at bh=40, t=9216 — OOM)
        xla_chunk = jax.jit(attention_xla)
        step = max(1, int(2e9 / (t * t * 4)))
        want = np.concatenate([
            np.asarray(xla_chunk(q[i:i + step], k[i:i + step],
                                 v[i:i + step]), np.float32)
            for i in range(0, bh, step)], axis=0)

        site_rows = {}
        t_base = None
        for name, flags in variants:
            if kind == "flash":
                fn = lambda q, k, v, f=flags: flash_attention(
                    q, k, v, None, bq, bk, interp, **f)
            else:
                fn = lambda q, k, v, f=flags: fused_attention(
                    q, k, v, None, bq, interp, **f)
            err = float(np.max(np.abs(
                np.asarray(jax.jit(fn)(q, k, v), np.float32) - want)))
            if args.cpu:
                site_rows[name] = {"max_abs_diff": err}
                continue
            dt = chain_time(fn, q, extras=(k, v),
                            iters=args.iters, reps=args.reps)
            if t_base is None:
                t_base = dt
            row = {"ms": round(dt * 1e3, 3),
                   "tflops_s": round(flops / dt / 1e12, 1),
                   "vs_base": round(t_base / dt, 3),
                   "max_abs_diff": err}
            site_rows[name] = row
            print(f"# {site}/{name}: {row}", file=sys.stderr, flush=True)
        rows[site] = site_rows
        if not args.cpu:
            best[site] = min(
                ((r["ms"], n) for n, r in site_rows.items()), default=None)

    # headline = the variant that actually ships (rowsum; sb16 measured a
    # loss and is off in production — ADVICE.md r3)
    print(json.dumps({
        "metric": "attn_fwd_variants",
        "value": (rows.get("sd768_self", {}).get("rowsum", {})
                  .get("vs_base")),
        "unit": "x vs base flash kernel at (40,9216,64)",
        "best": {s: b[1] for s, b in best.items()} if best else None,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
