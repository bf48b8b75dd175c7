"""VAE ENCODER A/B at 768px: Pallas conv3x3 dispatch vs forced-XLA.

Conv3x3 is wired into BOTH the encoder and decoder (models/vae.py:105-215),
but only the decode path had a committed same-session A/B
(results_vae_decode_ab_v5e.json, 1.94x). img2img / inpaint / DiffEdit /
`encode()` ride the encoder — this fills that hole (VERDICT r3 item 8).

Arms (same session, one jit program each, plain-loop timing — encode at
768px is hundreds of ms, far above the tunnel's dispatch-overhead regime):
  pallas  production dispatch (ops/conv3x3.py win-table)
  xla     conv3x3_supported forced False

Output: one JSON line -> redirect to results_vae_encode_ab_v5e.json.
Run:  python benchmarks/vae_encode_bench.py [--batch 4] [--px 768]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--px", type=int, default=768)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    import dpm_solver_tpu.ops.conv3x3 as _c3
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.sd_v1() if not args.cpu else VAEConfig.tiny(
        resolution=32, attn_resolutions=())
    px = args.px if not args.cpu else 32
    vae = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda r: vae.init(
        r, jnp.zeros((1, px, px, 3))))(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, px, px, 3)), jnp.float32)
    print("# vae init done", file=sys.stderr, flush=True)

    def sync(o):
        return float(o.ravel()[0])

    def timed(fn, reps):
        sync(fn(params, x))
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(params, x)
        sync(o)
        return (time.perf_counter() - t0) / reps

    def make_encode():
        # fresh lambda per arm: jit caches traces by callable identity and
        # the arms must trace under different conv dispatch
        return jax.jit(lambda vp, xx: vae.apply(
            vp, xx, method=AutoencoderKL.encode).mode().astype(jnp.float32))

    # flops from the forced-XLA lowering (cost analysis can't see inside
    # the Pallas custom calls; the count is dispatch-invariant)
    _orig = _c3.conv3x3_supported
    _c3.conv3x3_supported = lambda *a: False
    try:
        cx = make_encode().lower(params, x).compile()
        try:
            ca = cx.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001
            flops = 0.0
        t_xla = timed(lambda vp, xx: cx(vp, xx), args.reps)
        out_xla = np.asarray(cx(params, x), np.float32)
    finally:
        _c3.conv3x3_supported = _orig

    cp = make_encode()
    t_pal = timed(cp, args.reps)
    out_pal = np.asarray(cp(params, x), np.float32)
    err = float(np.max(np.abs(out_pal - out_xla)))

    rows = {
        "xla": {"ms": round(t_xla * 1e3, 1),
                "tflops_s": round(flops / t_xla / 1e12, 1)},
        "pallas": {"ms": round(t_pal * 1e3, 1),
                   "tflops_s": round(flops / t_pal / 1e12, 1)},
    }
    print(f"# encode arms: {rows}", file=sys.stderr)
    print(json.dumps({
        "metric": f"vae_encode_{px}_b{args.batch}_ab",
        "platform": jax.devices()[0].platform,
        **rows,
        "speedup": round(t_xla / t_pal, 3),
        "value": round(t_xla / t_pal, 3),
        "unit": "x vs forced-XLA conv lowering, same session",
        "max_abs_diff_bf16": err,
        "note": "encoder twin of results_vae_decode_ab_v5e.json; pallas "
                "tflops recomputed from the XLA-arm flop count",
    }))


if __name__ == "__main__":
    main()
