"""Int8 (W8A8) transformer stack vs bf16: SD-2.1 UNet eval A/B on one chip.

The kernel-level verdict for ops/quant.py: same 866M-param SD-2.1 UNet,
same random params, one CFG-doubled evaluation, timed bf16 vs
config.quant='w8a8' in the SAME session (tunnel throughput varies ~±5%
across sessions).  Also reports the relative output deviation of the
quantized eval (per-token dynamic activation scales; fp32 softmax/norms in
both stacks), so the speed number always travels with its accuracy cost.

v5e peaks: bf16 197 TF/s, int8 394 TOPS — only the transformer projections
and GEGLU FF run int8 (the conv trunk stays bf16), so the UNet-level bound
is set by the quantized share of the flops.

Run on a TPU host: python benchmarks/quant_bench.py [--batch 4]
(add --cpu --tiny --latent 16 for a structural smoke run)
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--latent", type=int, default=96)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/dpm_solver_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dpm_solver_tpu.models import ADMConfig, ADMUNet

    cfg = ADMConfig.sd_v2_1()
    if args.tiny:
        cfg = dataclasses.replace(cfg, model_channels=64, num_res_blocks=1,
                                  channel_mult=(1, 2))
    b2 = 2 * args.batch  # CFG-doubled batch, as served
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b2, args.latent, args.latent, 4)), jnp.float32)
    t = jnp.full((b2,), 500.0)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b2, 77, cfg.context_dim)) * 0.2, jnp.float32)

    unet = ADMUNet(config=cfg, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = jax.jit(lambda r: unet.init(
        r, x[:1], t[:1], None, ctx[:1], deterministic=True))(jax.random.key(0))
    # perturb every leaf: the zero-initialized residual/output projections
    # would otherwise make the accuracy comparison vacuous (output == 0)
    params = jax.jit(lambda p, r: jax.tree.map(
        lambda a, k: a + 0.02 * jax.random.normal(k, a.shape, a.dtype),
        p, jax.tree.unflatten(jax.tree.structure(p),
                              list(jax.random.split(
                                  r, len(jax.tree.leaves(p)))))))(
        params, jax.random.key(7))
    print(f"# init {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    def sync(o):
        return float(o.ravel()[0])

    def bench(quant):
        net = ADMUNet(config=dataclasses.replace(cfg, quant=quant),
                      compute_dtype=jnp.bfloat16)
        fn = jax.jit(lambda p, xx: net.apply(p, xx, t, None, ctx,
                                             deterministic=True))
        t0 = time.perf_counter()
        out = fn(params, x)
        sync(out)
        print(f"# {quant or 'bf16'} compile+warm "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(params, x)
        sync(out)
        return (time.perf_counter() - t0) / args.reps, np.asarray(out)

    # ---- micro-probe: does the backend lower s8xs8->s32 dots onto the
    # MXU's doubled int8 path at all? Decides whether a UNet-level loss
    # means "retire the mode" (no native path) or "fuse the quant overhead
    # in Pallas" (native path exists, overhead eats it). --------------------
    mm, kk, nn2 = 8192, 4096, 4096
    rng = np.random.default_rng(3)
    a8 = jnp.asarray(rng.integers(-127, 128, (mm, kk)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (kk, nn2)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((mm, kk)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((kk, nn2)), jnp.bfloat16)
    dot8 = jax.jit(lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    dotb = jax.jit(lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))

    def t_dot(fn, p, q):
        float(fn(p, q).ravel()[0])
        t0 = time.perf_counter()
        o = None
        for _ in range(20):
            o = fn(p, q)
        float(o.ravel()[0])
        return (time.perf_counter() - t0) / 20

    t8, tb = t_dot(dot8, a8, b8), t_dot(dotb, abf, bbf)
    fl = 2 * mm * kk * nn2
    micro = {"int8_tops": round(fl / t8 / 1e12, 1),
             "bf16_tflops": round(fl / tb / 1e12, 1),
             "int8_vs_bf16": round(tb / t8, 3)}
    print(f"# micro dot {mm}x{kk}x{nn2}: int8 {micro['int8_tops']} TOPS "
          f"vs bf16 {micro['bf16_tflops']} TF/s "
          f"({micro['int8_vs_bf16']}x)", file=sys.stderr, flush=True)

    dt_f, out_f = bench(None)
    rows = {"bf16_ms": round(dt_f * 1e3, 2), "micro_dot": micro}
    out_f64 = out_f.astype(np.float64)
    for mode in ("w8a8", "w8a8_conv"):
        dt_q, out_q = bench(mode)
        rel = float(np.sqrt(np.mean((out_q.astype(np.float64)
                                     - out_f64) ** 2)
                            / np.mean(out_f64 ** 2)))
        rows[mode] = {"ms": round(dt_q * 1e3, 2),
                      "speedup_vs_bf16": round(dt_f / dt_q, 4),
                      "rel_output_dev_vs_bf16": round(rel, 5)}
        print(f"# bf16 {dt_f*1e3:.1f} ms/eval | {mode} {dt_q*1e3:.1f} "
              f"ms/eval ({dt_f/dt_q:.3f}x) | rel out dev {rel:.4f}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "sd21_unet_eval_int8_speedup",
        "value": rows["w8a8_conv"]["speedup_vs_bf16"],
        "unit": "x_vs_bf16_same_session",
        "modes": rows,
        "batch_cfg_doubled": b2,
        "latent": args.latent,
    }))


if __name__ == "__main__":
    main()
