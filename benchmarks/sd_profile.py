"""SD-2.1 per-stage profile: where does the 967 ms/image (35% MFU) go?

Times, on one chip with K-scan amortization where applicable:
  * one CFG-doubled UNet eval (the 20x-repeated unit of the sampler)
  * the same eval with the Pallas attention kernels disabled (XLA lowering)
  * the VAE decode (once per image)
and prints XLA cost-analysis flops / implied TF/s per stage, so the
next optimization target is chosen from data (VERDICT r1 #5).

Run on a TPU host: python benchmarks/sd_profile.py [--batch 4] [--latent 96]
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
    p.add_argument("--latent", type=int, default=96)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    import dataclasses

    from dpm_solver_tpu.models import ADMConfig, ADMUNet
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig

    ucfg = ADMConfig.sd_v2_1()
    if args.tiny:
        ucfg = dataclasses.replace(ucfg, model_channels=64,
                                   num_res_blocks=1, channel_mult=(1, 2))
    unet = ADMUNet(config=ucfg, compute_dtype=jnp.bfloat16)
    bh = 2 * args.batch  # CFG-doubled
    ctx = jnp.zeros((bh, 77, ucfg.context_dim), jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bh, args.latent, args.latent, 4)), jnp.float32)
    tt = jnp.full((bh,), 500.0)
    params = jax.jit(lambda r: unet.init(
        r, x[:1], tt[:1], None, ctx[:1], deterministic=True))(jax.random.key(0))
    print("# unet init done", file=sys.stderr, flush=True)

    def sync(o):
        return float(o.ravel()[0])

    def timed(fn, arg, reps):
        sync(fn(arg))
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(arg)
        sync(o)
        return (time.perf_counter() - t0) / reps

    def cost_compiled(c):
        try:
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001
            return 0.0

    rows = {}

    def stage(name, fn):
        # A diagnostic arm that cannot compile (e.g. forced-XLA attention
        # at batch 8 materializes ~13.6 GB of 9216^2 score matrices and
        # OOMs HBM) must not kill the rest of the split.
        try:
            rows[name] = fn()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "memory space hbm" in msg or "Ran out of memory" in msg:
                msg = ("compile OOM: " +
                       msg[msg.find("Ran out of memory"):][:120])
            rows[name] = {"error": msg[:400]}
        print(f"# {name}: {rows[name]}", file=sys.stderr, flush=True)

    # params stay jit ARGUMENTS: as closure constants the 866M weights
    # embed in the HLO and exceed the tunnel's remote-compile payload
    # limit (HTTP 413)
    def unet_eval(pp, xx):
        return unet.apply(pp, xx, tt, None, ctx,
                          deterministic=True).astype(jnp.float32)

    import dpm_solver_tpu.ops.attention as attn_mod

    orig = attn_mod.token_attention
    for name, force in [("unet_eval_pallas_attn", None),
                        ("unet_eval_xla_attn", False)]:
        def patched(q, k, v, __force=force, **kw):
            kw["use_pallas"] = __force
            return orig(q, k, v, **kw)

        attn_mod.token_attention = patched if force is not None else orig

        def run_arm():
            jfn = jax.jit(lambda pp, xx: jax.lax.scan(
                lambda c, _: (unet_eval(pp, c), None), xx, None, length=4)[0])
            compiled = jfn.lower(params, x).compile()
            dt = timed(lambda xx: compiled(params, xx), x, args.reps) / 4
            flops = cost_compiled(compiled)
            return {"ms": round(dt * 1e3, 1),
                    "tflops_s": round(flops / dt / 1e12, 1)}

        stage(name, run_arm)
    attn_mod.token_attention = orig

    # conv-trunk-only twin (no SpatialTransformer blocks): splits the eval
    # between the conv/resblock trunk and the transformer stack
    conv_cfg = dataclasses.replace(ucfg, use_spatial_transformer=False,
                                   attention_resolutions=())
    conv_unet = ADMUNet(config=conv_cfg, compute_dtype=jnp.bfloat16)
    conv_params = jax.jit(lambda r: conv_unet.init(
        r, x[:1], tt[:1], None, None, deterministic=True))(jax.random.key(2))

    def conv_eval(pp, xx):
        return conv_unet.apply(pp, xx, tt, None, None,
                               deterministic=True).astype(jnp.float32)

    def run_conv():
        jconv = jax.jit(lambda pp, xx: jax.lax.scan(
            lambda c, _: (conv_eval(pp, c), None), xx, None, length=4)[0])
        cconv = jconv.lower(conv_params, x).compile()
        dt = timed(lambda xx: cconv(conv_params, xx), x, args.reps) / 4
        return {"ms": round(dt * 1e3, 1),
                "tflops_s": round(cost_compiled(cconv) / dt / 1e12, 1)}

    stage("unet_conv_trunk_only", run_conv)

    vae = AutoencoderKL(config=VAEConfig.sd_v1(), dtype=jnp.bfloat16)
    z = x[: args.batch]
    vae_params = jax.jit(lambda r: vae.init(
        r, jnp.zeros((1, 8 * args.latent, 8 * args.latent, 3))))(
            jax.random.key(1))

    def make_dec():
        # fresh lambda per lowering: jax.jit caches traces by callable
        # identity, and the two arms must trace under different dispatch
        return jax.jit(lambda vp, zz: vae.apply(
            vp, zz / 0.18215, method=AutoencoderKL.decode
        ).astype(jnp.float32))

    def run_dec():
        # flops from a forced-XLA lowering: cost analysis can't see inside
        # the Pallas conv3x3 custom calls, and the flop count is the same
        # either way
        import dpm_solver_tpu.ops.conv3x3 as _c3
        _orig_pred = _c3.conv3x3_supported
        _c3.conv3x3_supported = lambda *a: False
        dec_flops = cost_compiled(make_dec().lower(vae_params, z).compile())
        _c3.conv3x3_supported = _orig_pred
        cdec = make_dec().lower(vae_params, z).compile()
        dt = timed(lambda zz: cdec(vae_params, zz), z,
                   max(2, args.reps // 2))
        return {"ms": round(dt * 1e3, 1),
                "tflops_s": round(dec_flops / dt / 1e12, 1)}

    stage("vae_decode", run_dec)

    if ("ms" in rows.get("unet_eval_pallas_attn", {})
            and "ms" in rows.get("vae_decode", {})):
        steps20 = 20 * rows["unet_eval_pallas_attn"]["ms"]
        total = steps20 + rows["vae_decode"]["ms"]
        rows["derived"] = {
            "sampler_20nfe_ms_batch": round(steps20, 1),
            "pipe_ms_per_image": round(total / args.batch, 1),
            "vae_share_pct": round(100 * rows["vae_decode"]["ms"] / total, 1),
        }
    print(json.dumps({"metric": "sd21_stage_profile", "batch": args.batch,
                      "latent": args.latent,
                      "platform": jax.devices()[0].platform,
                      "stages": rows}))


if __name__ == "__main__":
    main()
