"""Bytes-roofline analysis of the SD-2.1 serving pipe (VERDICT r3 item 2).

The SD pipe has been reported in MFU ("~30%"), but the builder's own probes
show its projection matmuls are bandwidth-bound (results_int8_probe,
results_matmul_probe): for a bandwidth-bound model the honest ceiling is the
HBM-bytes roofline, and "30% MFU" misreads as 70% headroom. This script
computes, for ONE CFG-doubled UNet eval (the pipe's unit of work — 20 of
these per sampled batch) and for the VAE decode:

  flops, bytes      XLA cost_analysis of OUR compiled program (post-fusion
                    operand+output bytes — the compiler's own HBM estimate)
  t_mxu             flops / 197 TF/s (v5e bf16 peak)
  t_bytes           bytes / 819 GB/s (v5e HBM peak)
  roofline_ms       max(t_mxu, t_bytes) — the program cannot beat this
  measured_ms       chain-timed same session
  pct_of_roofline   roofline_ms / measured_ms
  bound             which wall is closer

plus an analytic floor (weights once + input + output — unachievable but
principled) and a STRUCTURAL enumeration of the largest remaining unfused
HBM round-trips (>= ~10 MB activations) with each one's bytes and ms at
819 GB/s, so the remaining fusion headroom is itemized instead of implied.

Run on a TPU host:  python benchmarks/roofline.py [--batch 4]
Output: one JSON line -> redirect to results_roofline_v5e.json.
`--cpu --tiny` gives a structural smoke run (no timing).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

V5E_PEAK_FLOPS = 197e12   # bf16
V5E_PEAK_BW = 819e9       # HBM bytes/s


def cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    try:
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception:  # noqa: BLE001
        flops = byts = 0.0
    return flops, byts


class forced_xla:
    """Context manager forcing every Pallas dispatch to the XLA lowering.

    XLA cost analysis cannot see inside Pallas custom calls, so the
    PRODUCTION program's flops/bytes are understated (the wired kernels'
    work is invisible). The forced-XLA lowering gives the dispatch-
    invariant flop count and an UPPER-bound byte count (the fusions the
    kernels perform reduce real traffic below it) — the true production
    bytes sit between the production-visible and forced-XLA readings.
    """

    def __enter__(self):
        import dpm_solver_tpu.ops.attention as _at
        import dpm_solver_tpu.ops.conv3x3 as _c3
        import dpm_solver_tpu.ops.geglu as _gg
        import dpm_solver_tpu.ops.ln_linear as _ll

        self._mods = (_c3, _gg, _ll, _at)
        self._saved = (_c3.conv3x3_supported, _gg.geglu_supported,
                       _ll.ln_linear_site_wins, _at.token_attention)
        _c3.conv3x3_supported = lambda *a: False
        _gg.geglu_supported = lambda *a: False
        _ll.ln_linear_site_wins = lambda *a: False
        orig_attn = self._saved[3]
        _at.token_attention = (
            lambda q, k, v, **kw: orig_attn(
                q, k, v, **{**kw, "use_pallas": False}))
        return self

    def __exit__(self, *exc):
        _c3, _gg, _ll, _at = self._mods
        (_c3.conv3x3_supported, _gg.geglu_supported,
         _ll.ln_linear_site_wins, _at.token_attention) = self._saved
        return False


def structural_roundtrips(batch: int, latent: int):
    """The big (>= ~10 MB) activation tensors that round-trip HBM per
    CFG-doubled UNet eval in the CURRENT build, from the SD-2.1 geometry
    (model_channels 320, mult (1,2,4,4), attn at ds 1,2,4, 2 res blocks,
    dh=64). One round-trip = write + read = 2x tensor bytes. Sites our
    Pallas kernels already keep in VMEM are listed with fused=True and
    bytes they AVOID, so the table itemizes both what is saved and what
    remains."""
    B = 2 * batch  # CFG doubles the batch
    rows = []

    def add(site, count, m, c, fused, what):
        byts = 2 * count * m * c * 2  # write+read, bf16
        rows.append({
            "site": site, "count": count, "tensor": f"[{m}, {c}] bf16",
            "mb_each": round(m * c * 2 / 1e6, 1), "fused": fused,
            "roundtrip_bytes": byts,
            "ms_at_819GBps": round(byts / V5E_PEAK_BW * 1e3, 3),
            "note": what,
        })

    # levels: (side, channels, n_transformer, n_resblock) — SD-2.1 counts:
    # per attn level 2 down + 3 up transformers (16 total incl. the 12px
    # middle one, pinned by test_tp_specs_cover_full_sd21_tree); resblocks
    # 2 down + 3 up per level, +2 in the middle block at 12px
    side = latent
    levels = [(side, 320, 5, 5), (side // 2, 640, 5, 5),
              (side // 4, 1280, 5, 5), (side // 8, 1280, 1, 7)]
    for li, (s, c, n_tr, n_rb) in enumerate(levels):
        m = B * s * s
        if m * c * 2 < 8e6:
            continue
        # each resblock: GN1 -> conv1 -> (emb add, GN2) -> conv2: the normed
        # tensors and h between convs round-trip (convs are XLA HLO convs)
        add(f"L{li}_{s}px_resblock_intermediates", n_rb * 3, m, c, False,
            "GN outputs + inter-conv h per resblock (XLA conv boundaries)")
        if n_tr:
            add(f"L{li}_{s}px_transformer_io", n_tr * 2, m, c, False,
                "GN->proj_in and proj_out->residual streams")
            # attn1 q/k/v + attention output + out-proj output
            add(f"L{li}_{s}px_attn1_qkv", n_tr * 3, m, c, False,
                "q/k/v written by projection, read by the attention kernel")
            add(f"L{li}_{s}px_attn1_out", n_tr * 2, m, c, False,
                "attention output -> out-proj -> residual (fusion A/B'd: "
                "LOSS, results_attn_out_fused_v5e.json — stays unfused)")
            # FF: geglu fused at 96/48px keeps the 8c intermediate in VMEM
            geglu_fused = m >= 16384
            add(f"L{li}_{s}px_ff_intermediate", n_tr, m, 8 * c, geglu_fused,
                "d->8d GEGLU projection intermediate"
                + (" — fused (ops/geglu.py), bytes AVOIDED" if geglu_fused
                   else " — unfused (XLA, below the m>=16384 win regime)"))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--latent", type=int, default=96)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache

    enable_compile_cache()
    import dataclasses
    import time

    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, model_wrapper
    from dpm_solver_tpu.models import ADMConfig, ADMUNet
    from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig
    from dpm_solver_tpu.pipelines import make_ldm_betas

    ucfg = ADMConfig.sd_v2_1()
    if args.tiny:
        ucfg = dataclasses.replace(ucfg, model_channels=64,
                                   num_res_blocks=1, channel_mult=(1, 2))
    unet = ADMUNet(config=ucfg, compute_dtype=jnp.bfloat16)
    ctx = jnp.zeros((2 * args.batch, 77, ucfg.context_dim), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(lambda r: unet.init(
        r, jnp.zeros((1, args.latent, args.latent, 4)), jnp.ones((1,)),
        None, ctx[:1], deterministic=True))(jax.random.key(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# unet init: {n_params/1e6:.0f}M params "
          f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)

    ns = NoiseScheduleVP.discrete(betas=make_ldm_betas())
    model_fn = model_wrapper(
        lambda x, t, c: unet.apply(params, x, t, None, c, deterministic=True),
        ns, model_type="v", guidance_type="classifier-free",
        condition=ctx[: args.batch], unconditional_condition=ctx[args.batch:],
        guidance_scale=args.scale)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, args.latent, args.latent, 4)), jnp.float32)
    tt = jnp.full((), 0.7, jnp.float32)

    del model_fn  # rebuilt per-call below so params stay a jit argument

    # one CFG-doubled UNet eval — the unit the 20-NFE trajectory repeats
    def unet_eval(x, p):
        mf = model_wrapper(
            lambda xx, t, c: unet.apply(p, xx, t, None, c,
                                        deterministic=True),
            ns, model_type="v", guidance_type="classifier-free",
            condition=ctx[: args.batch],
            unconditional_condition=ctx[args.batch:],
            guidance_scale=args.scale)
        return mf(x, tt)

    compiled = jax.jit(unet_eval).lower(x, params).compile()
    flops_vis, bytes_vis = cost(compiled)
    with forced_xla():
        cfx = jax.jit(lambda xx, pp: unet_eval(xx, pp)).lower(
            x, params).compile()
        flops, bytes_fx = cost(cfx)
    # analytic floor: weights once + input + output, bf16
    floor_bytes = n_params * 2 + x.size * 2 * 2

    out = {
        "metric": "sd21_bytes_roofline",
        "batch": args.batch, "latent": args.latent,
        "unet_params_m": round(n_params / 1e6, 1),
        "unet_eval": {
            # flops from the forced-XLA lowering (complete; production
            # cost analysis misses the Pallas custom-call work). True
            # production bytes lie in [production_visible, forced_xla]:
            # the kernels fuse away traffic the XLA structure would move,
            # but their own q/k/v streaming is invisible to cost analysis.
            "flops": flops, "flops_production_visible": flops_vis,
            "bytes_production_visible": bytes_vis,
            "bytes_forced_xla": bytes_fx,
            "floor_bytes_weights_io": floor_bytes,
            "t_mxu_ms": round(flops / V5E_PEAK_FLOPS * 1e3, 3),
            "t_bytes_ms_lo": round(bytes_vis / V5E_PEAK_BW * 1e3, 3),
            "t_bytes_ms_hi": round(bytes_fx / V5E_PEAK_BW * 1e3, 3),
            "t_floor_ms": round(floor_bytes / V5E_PEAK_BW * 1e3, 3),
        },
        "structural_roundtrips": structural_roundtrips(args.batch,
                                                       args.latent),
    }
    rts = out["structural_roundtrips"]
    out["structural_unfused_total_ms"] = round(
        sum(r["ms_at_819GBps"] for r in rts if not r["fused"]), 3)
    out["structural_avoided_ms"] = round(
        sum(r["ms_at_819GBps"] for r in rts if r["fused"]), 3)

    if not args.cpu:
        from benchmarks._timing import chain_time

        dt = chain_time(lambda xx, pp: unet_eval(xx, pp), x, extras=(params,),
                        iters=args.iters, reps=args.reps)
        ue = out["unet_eval"]
        ue["measured_ms"] = round(dt * 1e3, 3)
        roof_lo = max(ue["t_mxu_ms"], ue["t_bytes_ms_lo"])
        roof_hi = max(ue["t_mxu_ms"], ue["t_bytes_ms_hi"])
        ue["roofline_ms"] = [roof_lo, roof_hi]
        ue["bound"] = ("mxu" if ue["t_mxu_ms"] >= ue["t_bytes_ms_lo"]
                       else "hbm")
        ue["pct_of_roofline"] = [
            round(100 * roof_lo / ue["measured_ms"], 1),
            round(100 * roof_hi / ue["measured_ms"], 1)]
        ue["mfu_pct"] = round(100 * flops / dt / V5E_PEAK_FLOPS, 1)
        ue["hbm_util_pct"] = [
            round(100 * bytes_vis / dt / V5E_PEAK_BW, 1),
            round(100 * bytes_fx / dt / V5E_PEAK_BW, 1)]
        print(f"# unet eval: {ue}", file=sys.stderr, flush=True)

        # VAE decode roofline (stage 2 of the pipe)
        vcfg = VAEConfig.sd_v1()
        vae = AutoencoderKL(config=vcfg, dtype=jnp.bfloat16)
        vae_params = jax.jit(lambda r: vae.init(
            r, jnp.zeros((1, 8 * args.latent, 8 * args.latent, 3))))(
                jax.random.key(1))
        dec = lambda z, vp: vae.apply(vp, z / 0.18215,
                                      method=AutoencoderKL.decode)
        cdec = jax.jit(dec).lower(x, vae_params).compile()
        dflops_vis, dbytes_vis = cost(cdec)
        with forced_xla():
            cdfx = jax.jit(lambda z, vp: dec(z, vp)).lower(
                x, vae_params).compile()
            dflops, dbytes_fx = cost(cdfx)
        # decode is ~hundreds of ms — far above the dispatch-overhead
        # regime, so a plain same-session loop is valid timing
        import time as _t

        jdec = jax.jit(dec)
        float(jdec(x, vae_params).ravel()[0])
        t0 = _t.perf_counter()
        o = None
        for _ in range(args.reps):
            o = jdec(x, vae_params)
        float(o.ravel()[0])
        ddt = (_t.perf_counter() - t0) / args.reps
        d_lo = max(dflops / V5E_PEAK_FLOPS, dbytes_vis / V5E_PEAK_BW)
        d_hi = max(dflops / V5E_PEAK_FLOPS, dbytes_fx / V5E_PEAK_BW)
        out["vae_decode"] = {
            "flops": dflops, "flops_production_visible": dflops_vis,
            "bytes_production_visible": dbytes_vis,
            "bytes_forced_xla": dbytes_fx,
            "t_mxu_ms": round(dflops / V5E_PEAK_FLOPS * 1e3, 3),
            "t_bytes_ms_lo": round(dbytes_vis / V5E_PEAK_BW * 1e3, 3),
            "t_bytes_ms_hi": round(dbytes_fx / V5E_PEAK_BW * 1e3, 3),
            "measured_ms": round(ddt * 1e3, 3),
            "bound": ("mxu" if dflops / V5E_PEAK_FLOPS
                      >= dbytes_vis / V5E_PEAK_BW else "hbm"),
            "pct_of_roofline": [round(100 * d_lo / ddt, 1),
                                round(100 * d_hi / ddt, 1)],
        }
        print(f"# vae decode: {out['vae_decode']}", file=sys.stderr,
              flush=True)

        # pipe-level projection: 20 UNet evals + decode vs the measured pipe
        steps = 20
        out["pipe_20nfe"] = {
            "roofline_ms_per_batch": [
                round(steps * roof_lo + d_lo * 1e3, 1),
                round(steps * roof_hi + d_hi * 1e3, 1)],
            "roofline_ms_per_image": [
                round((steps * roof_lo + d_lo * 1e3) / args.batch, 1),
                round((steps * roof_hi + d_hi * 1e3) / args.batch, 1)],
            "projected_from": "20 x unet_eval roofline + vae decode "
                              "roofline; [lo, hi] = bytes bracket "
                              "(production-visible, forced-XLA)",
        }
        out["value"] = ue["pct_of_roofline"][0]
        out["unit"] = ("% of max(MXU, HBM-bytes-lo) roofline, one CFG "
                       "UNet eval")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
