"""Fused LayerNorm->Linear kernel vs the XLA composition at SD-2.1 sites.

The three LN->proj pairs per BasicTransformerBlock (self-attn qkv d->3d,
cross-attn q d->d, FF in-proj d->8d) each materialize LN(x) in HBM under
XLA. This script A/Bs `ops/ln_linear.py` at every (site, projection) pair
of the 96px-latent SD-2.1 UNet and prints per-site speedups — the verdict
that decides whether the model wires the kernel in (it stays unwired until
this shows a win; see ops/fused_update.py for the retired precedent).

Flops = 2*M*d*n per pair, counted directly (XLA cost analysis cannot see
into the Pallas call). Run on a TPU host:
    python benchmarks/ln_linear_bench.py [--batch 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# (side, d) transformer sites in the SD-2.1 96px-latent UNet; per site the
# LN->proj pairs are qkv (3d), q_cross (d), ff_in (8d)
SITES = [(96, 320), (48, 640), (24, 1280), (12, 1280)]
PROJS = (("qkv", 3), ("q_cross", 1), ("ff_in", 8))


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
    from dpm_solver_tpu.ops.ln_linear import (
        ln_linear,
        ln_linear_engaged,
        ln_linear_reference,
    )

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
        for pname, mult in PROJS:
            n = mult * d
            rs = np.random.default_rng(0)
            x = jnp.asarray(rs.standard_normal((m, d)) * 0.1, jnp.bfloat16)
            gamma = jnp.asarray(rs.normal(1, 0.1, (d,)), jnp.float32)
            beta = jnp.asarray(rs.normal(0, 0.1, (d,)), jnp.float32)
            w = jnp.asarray(rs.standard_normal((d, n)) * d ** -0.5,
                            jnp.bfloat16)
            c = jnp.asarray(rs.normal(0, 0.1, (n,)), jnp.float32)
            flops = 2 * m * d * n
            site = {"m": m, "n": n,
                    # the A/B is only evidence when the kernel actually
                    # engages — round-2's table compared the fallback
                    # against itself at most sites (noise, not signal)
                    "engaged": ln_linear_engaged(m, d, n)}
            res = {}
            for name, fn0 in (
                ("xla", lambda xx, f=None: ln_linear_reference(
                    xx, gamma, beta, w, c)),
                ("pallas", lambda xx: ln_linear(xx, gamma, beta, w, c)),
            ):
                fn = jax.jit(lambda x0, f=fn0: jax.lax.scan(
                    lambda cx, _: (f(cx)[:, :d].astype(cx.dtype), None),
                    x0, None, length=args.scan)[0])
                try:
                    dt = timed(fn, x) / args.scan
                    res[name] = fn0(x)
                    site[name] = {"ms": round(dt * 1e3, 3),
                                  "tflops_s": round(flops / dt / 1e12, 1)}
                except Exception as e:  # noqa: BLE001 - survey all shapes
                    site[name] = f"FAILED: {type(e).__name__}: " \
                                 f"{str(e).splitlines()[0][:100]}"
            if isinstance(site.get("xla"), dict) and isinstance(
                    site.get("pallas"), dict):
                site["speedup"] = round(
                    site["xla"]["ms"] / site["pallas"]["ms"], 2)
                site["max_abs_diff"] = float(jnp.max(jnp.abs(
                    res["xla"].astype(jnp.float32)
                    - res["pallas"].astype(jnp.float32))))
            rows[f"{side}px_d{d}_{pname}"] = site
            print(f"# {side}px d{d} {pname}: {site}", file=sys.stderr,
                  flush=True)

    print(json.dumps({"metric": "sd21_ln_linear_ab", "batch": args.batch,
                      "platform": jax.devices()[0].platform, "sites": rows}))


if __name__ == "__main__":
    main()
