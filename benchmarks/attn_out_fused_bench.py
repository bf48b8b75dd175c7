"""A/B the fused attention->out-proj->residual epilogue at the SD sites.

Motivation (results_matmul_probe_v5e.json): the attention out-projection at
the 96px site runs at 20.7 TF/s — worst row in the probe table — because the
[73728, 320] attention output round-trips HBM between the flash kernel and a
k=n=320 matmul that tiles poorly on the MXU. `attention_out_fused` dots each
head's output block against its W_out slice inside the flash kernel's
epilogue (plus bias + residual) so that tensor never leaves VMEM.

Arms (both one jit program, chain-timed via benchmarks/_timing.chain_time —
sub-10 ms work must never be per-call timed through the tunnel):
  base   token_attention (production dispatch: rowsum flash/panel kernel)
         -> XLA out-projection + bias + residual
  fused  attention_out_fused

Sites: the two long-sequence self-attention regimes of SD-2.1@768px
(B=8 CFG-doubled batch 4): 96px (H=5, T=9216, dh=64, C=320) and
48px (H=10, T=2304, dh=64, C=640).

Run on a TPU host:  python benchmarks/attn_out_fused_bench.py
Output: one JSON line -> redirect to results_attn_out_fused_v5e.json.
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
        attention_out_fused,
        attention_out_ref,
    )

    interp = args.cpu
    # (site, (B, T, H, dh, C)) — CFG-doubled batch 4 at 768px
    sites = [
        ("sd768_96px", (8, 9216, 5, 64, 320)),
        ("sd768_48px", (8, 2304, 10, 64, 640)),
    ]
    if args.cpu:
        sites = [("sd768_96px", (1, 512, 2, 64, 128)),
                 ("sd768_48px", (1, 384, 2, 64, 128))]

    rows = {}
    for site, (b, t, h, dh, c) in sites:
        rs = np.random.RandomState(0)
        inner = h * dh
        q = jnp.asarray(rs.randn(b, t, inner), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, t, inner), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, t, inner), jnp.bfloat16)
        w = jnp.asarray(rs.randn(inner, c) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rs.randn(c) * 0.05, jnp.float32)
        res = jnp.asarray(rs.randn(b, t, c), jnp.bfloat16)
        # attention flops + out-proj flops (what both arms compute)
        flops = 4 * b * h * t * t * dh + 2 * b * t * inner * c

        base = lambda q, k, v, w, bias, res: attention_out_ref(
            q, k, v, w, bias, res, num_heads=h)
        arms = [("base", base)]
        for cname, cflag in (("fused_concat", True), ("fused_perhead", False)):
            arms.append((cname,
                         lambda q, k, v, w, bias, res, cf=cflag:
                         attention_out_fused(q, k, v, w, bias, res, h,
                                             None, interp, cf)))

        want = np.asarray(jax.jit(base)(q, k, v, w, bias, res), np.float32)
        errs = {}
        for name, fn in arms[1:]:
            got = np.asarray(jax.jit(fn)(q, k, v, w, bias, res), np.float32)
            errs[name] = float(np.max(np.abs(got - want)))
        if args.cpu:
            rows[site] = {"max_abs_diff": errs}
            print(f"# {site}: max_abs_diff={errs}", file=sys.stderr)
            continue

        out = {}
        for name, fn in arms:
            dt = chain_time(fn, q, extras=(k, v, w, bias, res),
                            iters=args.iters, reps=args.reps)
            out[name] = {"ms": round(dt * 1e3, 3),
                         "tflops_s": round(flops / dt / 1e12, 1)}
            if name in errs:
                out[name]["vs_base"] = round(out["base"]["ms"] / (dt * 1e3), 3)
                out[name]["max_abs_diff"] = errs[name]
            print(f"# {site}/{name}: {out[name]}", file=sys.stderr,
                  flush=True)
        out["vs_base"] = max(out[n].get("vs_base", 0) for n, _ in arms[1:])
        rows[site] = out

    print(json.dumps({
        "metric": "attn_out_fused_ab",
        "method": f"chain_time iters={args.iters} reps={args.reps}, "
                  "same session both arms",
        "value": rows.get("sd768_96px", {}).get("vs_base"),
        "unit": "x vs unfused (attention kernel + XLA out-proj) at 96px",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
