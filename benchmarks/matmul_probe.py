"""Root-cause probe for the SD transformer projection matmuls.

results_int8_probe_v5e.json measured the SD-2.1 96px qkv site
(m=73728, k=320, n=960, bf16) at 54.4 TF/s, and called the site
"bandwidth-bound". The roofline disagrees (arithmetic intensity ~236
flop/byte vs the v5e ridge at ~240 — the shape is right AT the ridge), so
this probe re-times the projection sites with the in-program loop
methodology (benchmarks/_timing.py — per-call timings through the tunnel
carry a 0.2-3 ms/dispatch overhead that poisons sub-ms kernels) across
layout/padding/dtype variants:

  baseline      jnp.dot, f32 accum, bf16 epilogue
  pad128        k and n zero-padded to 128-multiples (weights pre-padded
                host-side, x padded in-program — numerically exact)
  bf16_acc      bf16 cross-pass accumulator
  w_transposed  n-major weight layout via dot_general

Sites (batch 4 x 2 CFG):
  96px qkv   m=73728 k=320  n=960
  96px out   m=73728 k=320  n=320
  48px qkv   m=18432 k=640  n=1920
  ff_in 96px m=73728 k=320  n=2560

Run: python benchmarks/matmul_probe.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax.numpy as jnp

    from benchmarks._cache import enable_compile_cache
    from benchmarks._timing import chain_time
    enable_compile_cache()

    rs = np.random.RandomState(0)

    sites = {
        "qkv_96px": (73728, 320, 960),
        "out_96px": (73728, 320, 320),
        "qkv_48px": (18432, 640, 1920),
        "ff_in_96px": (73728, 320, 2560),
        "control_128mult": (73728, 512, 1024),
    }
    report = {"metric": "sd_projection_matmul_probe_v5e",
              "method": "in-program 20-iter loop, 3 reps (benchmarks/_timing.py)",
              "sites": {}}
    for name, (m, k, n) in sites.items():
        x = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rs.randn(k, n) / np.sqrt(k), jnp.bfloat16)
        flops = 2 * m * k * n
        rows = {}

        def run(tag, kernel, extras):
            dt = chain_time(kernel, x, extras)
            rows[tag] = {"ms": round(dt * 1e3, 3),
                         "tflops_s": round(flops / dt / 1e12, 1)}
            print(f"# {name} {tag}: {rows[tag]}", file=sys.stderr, flush=True)

        run("baseline",
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16), (w,))

        kp, np_ = -k % 128, -n % 128
        if kp or np_:
            wp = jnp.pad(w, ((0, kp), (0, np_)))
            run("pad128",
                lambda a, b: jnp.dot(
                    jnp.pad(a, ((0, 0), (0, kp))) if kp else a, b,
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)[:, :n], (wp,))

        run("bf16_acc", lambda a, b: jnp.dot(a, b), (w,))

        wt = jnp.asarray(np.asarray(w, np.float32).T, jnp.bfloat16)
        import jax.lax as lax
        run("w_transposed",
            lambda a, b: lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16), (wt,))

        report["sites"][name] = {"shape": [m, k, n], "rows": rows}

    print(json.dumps(report))


if __name__ == "__main__":
    main()
