"""Fused solver-update kernel vs XLA fusion: A/B table across shapes.

The update x' = a*x + b@hist (+ s*z) is pure HBM-bandwidth work (5-6 reads +
1 write per element). This measures the Pallas kernel (ops/fused_update.py,
ragged tails masked in-kernel — no host-side block pad) against XLA's own
fusion of the naive jnp expression, at the shapes the solver actually runs:
CIFAR batches, score_sde batches, SD-2.1 latents. Each variant runs under a
K-deep on-device scan so per-op time is dispatch-free; bandwidth is
(n_operands+1) * bytes / time against the v5e HBM roofline (~819 GB/s).

The winner per shape decides `use_pallas` defaults (VERDICT r1 #7: make the
kernel win or retire the claim — either way, committed numbers).

Run on a TPU host: python benchmarks/fused_update_bench.py; one JSON line.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

K = 50
HBM_GBPS = 819.0  # v5e


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.ops.fused_update import fused_solver_update

    def sync(out):
        return float(out.ravel()[0])

    shapes = [
        ("cifar_b64", (64, 32, 32, 3)),
        ("cifar_b256", (256, 32, 32, 3)),
        ("sd_latent_b4", (4, 96, 96, 4)),      # 147456 el: ragged vs 64k blk
        ("sd_latent_b16", (16, 96, 96, 4)),
        ("imagenet256_b8", (8, 128, 128, 4)),
    ]
    rng = np.random.default_rng(0)
    rows = {}
    for name, shape in shapes:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        hist = jnp.asarray(rng.standard_normal((3,) + shape), jnp.float32)
        z = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = jnp.float32(0.7)
        b = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
        s = jnp.float32(0.05)

        # Harness notes (both earlier attempts were unfair):
        #  * a scan with loop-invariant hist/z lets XLA hoist b@hist + s*z
        #    out of the loop (measured an impossible "1185 GB/s");
        #  * standalone per-dispatch timing through the tunneled backend is
        #    dominated by ~500us of round-trip latency per op.
        # So: ONE compiled program, a K-step mini-solver scan whose body is
        # exactly the real usage — per-step coefficients from scanned rows,
        # history pushed every step — nothing is loop-invariant and there
        # is a single dispatch.
        rows_a = jnp.linspace(0.95, 1.05, K)
        rows_b = jnp.stack([jnp.linspace(0.1, 0.2, K),
                            jnp.linspace(-0.2, -0.1, K),
                            jnp.linspace(0.05, 0.1, K)], axis=1)
        rows_s = jnp.linspace(0.01, 0.02, K)

        def make_runner(op):
            def body(carry, row):
                xx, hist = carry
                ra, rb, rs = row
                x2 = op(ra, rb, rs, xx, hist)
                hist = jnp.concatenate([x2[None], hist[:-1]], axis=0)
                return (x2, hist), ()

            def run(xx):
                hist0 = jnp.stack([xx * 0.9, xx * 0.8, xx * 0.7])
                (xf, _), _ = jax.lax.scan(
                    body, (xx, hist0), (rows_a, rows_b, rows_s))
                return xf

            return jax.jit(run)

        def xla_row_op(ra, rb, rs, xx, hist):
            return (ra * xx + rb[0] * hist[0] + rb[1] * hist[1]
                    + rb[2] * hist[2] + rs * z)

        def pallas_row_op(ra, rb, rs, xx, hist):
            return fused_solver_update(ra, rb, rs, xx, hist, z,
                                       interpret=args.cpu)

        out = {}
        for key, op in [("xla", xla_row_op), ("pallas", pallas_row_op)]:
            jrun = make_runner(op)
            sync(jrun(x))
            t0 = time.perf_counter()
            o = None
            for _ in range(args.reps):
                o = jrun(x)
            sync(o)
            dt = (time.perf_counter() - t0) / args.reps / K
            # per step: read x + 3 hist + z, write x' (+ the hist shift,
            # identical work in both paths, excluded from the nominal count)
            nbytes = 6 * x.size * 4
            out[key] = {"us": round(dt * 1e6, 2),
                        "gbps": round(nbytes / dt / 1e9, 1)}
        out["pallas_vs_xla"] = round(out["xla"]["us"] / out["pallas"]["us"], 3)
        rows[name] = out
        print(f"# {name} {shape}: xla {out['xla']['us']}us "
              f"({out['xla']['gbps']} GB/s) | pallas {out['pallas']['us']}us "
              f"({out['pallas']['gbps']} GB/s) | ratio "
              f"{out['pallas_vs_xla']}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "fused_update_kernel_vs_xla",
        "unit": "per-op microseconds (K-scan amortized)",
        "hbm_roofline_gbps": HBM_GBPS,
        "platform": jax.devices()[0].platform,
        "shapes": rows,
    }))


if __name__ == "__main__":
    main()
