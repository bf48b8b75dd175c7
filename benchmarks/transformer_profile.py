"""SpatialTransformer stack decomposition at the SD-2.1 hot shapes.

The UNet stage profile (results_sd_stage_profile_v5e.json) splits the
166 ms CFG eval into a 48 ms conv trunk and a ~118 ms transformer stack
at ~39 TF/s — this script breaks the stack down further so the next
kernel is chosen from data, not guesses. For each transformer site
(tokens, width, context) in the SD-2.1 96x96-latent UNet it times, as
separately jitted programs on a K-repeat scan:

  * the full TransformerBlock,
  * self-attention only (LN + fused qkv + kernel + out proj),
  * cross-attention only (S=77 context),
  * the GEGLU FeedForward only (LN + 8x proj + gate + down proj),

with XLA cost-analysis flops per piece. Reference counterpart:
examples/stable-diffusion/ldm/modules/attention.py:196-215.

Run on a TPU host: python benchmarks/transformer_profile.py [--batch 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


# (side, channels, heads, blocks) per SD-2.1 level at latent 96; block
# count = down + up occurrences of depth-1 SpatialTransformer
SITES = [
    (96, 320, 5, 5),
    (48, 640, 10, 5),
    (24, 1280, 20, 5),
    (12, 1280, 20, 7),  # level 3 + mid
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="CFG-doubled batch")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--scan", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.models.transformer import (GEGLUFeedForward,
                                                   TransformerBlock)

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

    def cost(c):
        try:
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001
            return 0.0

    import flax.linen as nn

    rows = {}
    total_ms = {"block": 0.0, "self_attn": 0.0, "cross_attn": 0.0, "ff": 0.0}
    for side, ch, heads, nblocks in SITES:
        t = side * side
        rs = np.random.default_rng(0)
        x = jnp.asarray(rs.standard_normal((args.batch, t, ch)) * 0.1,
                        jnp.float32)
        ctx = jnp.asarray(rs.standard_normal((args.batch, 77, 1024)) * 0.1,
                          jnp.float32)

        block = TransformerBlock(heads, ch // heads, dtype=jnp.bfloat16)
        bparams = jax.jit(block.init)(jax.random.key(0), x[:1], ctx[:1])

        class SelfAttnOnly(nn.Module):
            @nn.compact
            def __call__(self, h):
                from dpm_solver_tpu.models.transformer import CrossAttention
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="norm1")(h)
                return CrossAttention(heads, ch // heads, dtype=jnp.bfloat16,
                                      name="attn1")(h)

        class CrossAttnOnly(nn.Module):
            @nn.compact
            def __call__(self, h, c):
                from dpm_solver_tpu.models.transformer import CrossAttention
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="norm2")(h)
                return CrossAttention(heads, ch // heads, dtype=jnp.bfloat16,
                                      name="attn2")(h, context=c)

        class FFOnly(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="norm3")(h)
                return GEGLUFeedForward(dtype=jnp.bfloat16, name="ff")(h)

        pieces = {
            "block": (block, (x, ctx), bparams),
            "self_attn": (SelfAttnOnly(), (x,), None),
            "cross_attn": (CrossAttnOnly(), (x, ctx), None),
            "ff": (FFOnly(), (x,), None),
        }
        site = {}
        for name, (mod, xs, pp) in pieces.items():
            if pp is None:
                pp = jax.jit(mod.init)(jax.random.key(1),
                                       *[u[:1] for u in xs])
            fn = jax.jit(lambda pp, x0, rest=xs[1:], m=mod: jax.lax.scan(
                lambda c, _: (m.apply(pp, c, *rest).astype(jnp.float32), None),
                x0, None, length=args.scan)[0])
            comp = fn.lower(pp, xs[0]).compile()
            dt = timed(lambda x0: comp(pp, x0), xs[0]) / args.scan
            site[name] = {"ms": round(dt * 1e3, 2),
                          "tflops_s": round(cost(comp) / args.scan / dt / 1e12, 1)}
            total_ms[name] += dt * 1e3 * nblocks
        rows[f"{side}px_c{ch}"] = site
        print(f"# {side}px c{ch} x{nblocks}: {site}", file=sys.stderr,
              flush=True)

    rows["weighted_totals_ms"] = {k: round(v, 1) for k, v in total_ms.items()}
    print(json.dumps({"metric": "sd21_transformer_profile",
                      "batch": args.batch,
                      "platform": jax.devices()[0].platform, "sites": rows}))


if __name__ == "__main__":
    main()
