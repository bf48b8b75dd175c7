"""Flash-attention forward tile sweep at the SD-2.1@768 hot shape.

The 9216-token self-attention runs 5x per UNet eval (~47% of the eval,
results_attn_sweep_v5e.json is the evidence for the block choice in
ops/attention.py::flash_block_q). d=64 halves the MXU's effective peak
(contraction/output lanes), so the ceiling here is ~98 TF/s; the sweep
finds how close the running-softmax kernel gets and which (block_q,
block_k) to dispatch.

Run on a TPU host: python benchmarks/attn_sweep.py [--shape 40,9216,64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

def sweep_candidates(t):
    """(block_q, block_k) pairs from divisors of t (the kernel pads
    non-divisors, which wastes up to a block of k work — divisors only),
    capped to the useful range."""
    divs = [c for c in range(128, min(t, 4096) + 1, 64) if t % c == 0]
    if t <= 4096 and t not in divs:
        divs.append(t)
    pairs = []
    for bq in divs:
        for bk in divs:
            if 256 <= bq <= 3072 and bk >= 256:
                pairs.append((bq, bk))
    # compiles are ~10s each through the tunnel: keep the biggest tiles
    # (grid overhead shrinks with area) plus the current default
    pairs.sort(key=lambda p: p[0] * p[1], reverse=True)
    keep = [p for p in pairs if p[0] * p[1] >= 128 * 1024][:14]
    if (1024, 1024) in pairs and (1024, 1024) not in keep:
        keep.append((1024, 1024))
    return keep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="40,9216,64")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--chain", action="store_true",
                    help="time each tile as 20 applications inside ONE jit "
                         "program (benchmarks/_timing.py chain_time) — the "
                         "per-call mode is dispatch-inflated through the "
                         "tunnel (~0.2-3 ms/call, varies by session) and "
                         "biased toward big-tile configs")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    bh, t, d = map(int, args.shape.split(","))

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.ops.attention import (
        _flash_vmem_est,
        attention_xla,
        flash_attention,
    )

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
    flops = 4 * bh * t * t * d

    from benchmarks._timing import chain_time

    def timeit(raw):
        """raw: un-jitted (q, k, v) -> out callable."""
        if args.chain:
            return chain_time(raw, q, extras=(k, v), iters=args.iters,
                              reps=3)
        f = jax.jit(raw)
        out = f(q, k, v)
        float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(q, k, v)
        float(out.ravel()[0])
        return (time.perf_counter() - t0) / args.reps

    ref = jax.jit(lambda q, k, v: attention_xla(q, k, v))
    t_xla = timeit(lambda q, k, v: attention_xla(q, k, v))
    want = np.asarray(ref(q, k, v), np.float32)
    rows = {"xla": {"ms": round(t_xla * 1e3, 2),
                    "tflops_s": round(flops / t_xla / 1e12, 1)}}
    print(f"# xla: {rows['xla']}", file=sys.stderr, flush=True)

    best = None
    for bq, bk in sweep_candidates(t):
        if _flash_vmem_est(bq, bk, d) > 12_000_000:
            continue
        raw = lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, None, bq, bk)
        try:
            dt = timeit(raw)
            # chain mode: skip the per-tile parity compile (tiling does
            # not change numerics — parity pinned in the committed
            # per-call sweep + tests/test_attention_kernel.py)
            err = None if args.chain else float(np.max(np.abs(
                np.asarray(jax.jit(raw)(q, k, v), np.float32) - want)))
        except Exception as e:  # noqa: BLE001 — survey all tilings
            rows[f"bq{bq}_bk{bk}"] = f"FAILED: {str(e).splitlines()[0][:90]}"
            continue
        row = {"ms": round(dt * 1e3, 2),
               "tflops_s": round(flops / dt / 1e12, 1),
               "vs_xla": round(t_xla / dt, 2)}
        if err is not None:
            row["max_abs_diff"] = err
        rows[f"bq{bq}_bk{bk}"] = row
        print(f"# bq{bq}/bk{bk}: {row}", file=sys.stderr, flush=True)
        if best is None or dt < best[0]:
            best = (dt, bq, bk)

    # panel (full-K, single-pass) kernel bq sweep where its VMEM regime fits
    from dpm_solver_tpu.ops.attention import fused_attention, panel_fits_vmem

    if panel_fits_vmem(t, d):
        for bq in sorted({c for c in (256, 384, 512, 576, 768, 1024, 1152)
                          if t % c == 0}):
            if 4 * bq * t + 2 * t * max(d, 128) * 4 > 12_000_000:
                continue
            raw = lambda q, k, v, bq=bq: fused_attention(
                q, k, v, None, bq)
            try:
                dt = timeit(raw)
                err = None if args.chain else float(np.max(np.abs(
                    np.asarray(jax.jit(raw)(q, k, v), np.float32) - want)))
            except Exception as e:  # noqa: BLE001
                rows[f"panel_bq{bq}"] = f"FAILED: {str(e).splitlines()[0][:90]}"
                continue
            row = {"ms": round(dt * 1e3, 2),
                   "tflops_s": round(flops / dt / 1e12, 1),
                   "vs_xla": round(t_xla / dt, 2)}
            if err is not None:
                row["max_abs_diff"] = err
            rows[f"panel_bq{bq}"] = row
            print(f"# panel bq{bq}: {row}", file=sys.stderr, flush=True)
            if dt < best[0]:
                best = (dt, f"panel_{bq}", None)

    print(json.dumps({
        "metric": "sd768_flash_attn_fwd_sweep"
                  + ("_chained" if args.chain else ""),
        "shape": [bh, t, d],
        "value": round(flops / best[0] / 1e12, 1) if best else None,
        "unit": "TF/s (best tile)" + (
            f" — chain_time iters={args.iters}, dispatch-free"
            if args.chain else
            " — per-call, dispatch-inflated through the tunnel"),
        "best": {"block_q": best[1], "block_k": best[2]} if best else None,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
