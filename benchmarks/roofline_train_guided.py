"""Bytes/MXU roofline for the training and guided rows (VERDICT r4 item 4).

results_train_v5e.json reports the NCSN++ VE train step at 45.7% MFU and
results_guided_v5e.json the classifier-guided ADM eval at 56.8% — but
unlike the SD row (benchmarks/roofline.py -> results_roofline_v5e.json)
neither says how close that is to the program's OWN ceiling. This script
gives both rows the same treatment:

  flops, bytes      XLA cost_analysis of the compiled program (visible) and
                    under the forced-XLA lowering (complete flops; the hi
                    end of the bytes bracket)
  t_mxu / t_bytes   flops / 197 TF/s; bytes / 819 GB/s (v5e peaks)
  roofline_ms       max(t_mxu, t_bytes) per bytes-bracket end
  measured_ms       same-session timing (train: plain loop over the donated
                    train step — ~90 ms/step is far above the tunnel's
                    dispatch overhead; guided: chain-timed model eval)
  pct_of_roofline   how much of the program's own ceiling is achieved

plus the train step's analytic optimizer-traffic floor: with P fp32
params, one Adam+EMA step at minimum reads {params, m, v, ema, grads} and
writes {params, m, v, ema} — 9 x 4P bytes that no fusion can remove, on
top of the fwd+bwd activation traffic.

Units match the measured artifacts: the train unit is ONE optimizer step
at global batch 128 (the bf16 mixed-precision arm, n_jitted_steps=1 — the
n5 arm's win is dispatch amortization, not per-step work); the guided unit
is ONE classifier-guided model eval (UNet + classifier fwd + classifier
grad), the thing the 20-NFE trajectory repeats.

Run on a TPU host: python benchmarks/roofline_train_guided.py
(--cpu --tiny for a structural smoke run; --part train|guided to split.)
Output: one JSON line -> results_roofline_train_guided_v5e.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def _cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    try:
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:  # noqa: BLE001
        return 0.0, 0.0


def _roofline_fields(flops, bytes_vis, bytes_fx, measured_s):
    t_mxu = flops / V5E_PEAK_FLOPS
    t_lo = bytes_vis / V5E_PEAK_BW
    t_hi = bytes_fx / V5E_PEAK_BW
    out = {
        "flops": flops,
        "bytes_production_visible": bytes_vis,
        "bytes_forced_xla": bytes_fx,
        "t_mxu_ms": round(t_mxu * 1e3, 3),
        "t_bytes_ms_lo": round(t_lo * 1e3, 3),
        "t_bytes_ms_hi": round(t_hi * 1e3, 3),
        "bound": "mxu" if t_mxu >= t_lo else "hbm",
    }
    if measured_s is not None:
        roof_lo, roof_hi = max(t_mxu, t_lo), max(t_mxu, t_hi)
        out.update({
            "measured_ms": round(measured_s * 1e3, 3),
            "roofline_ms": [round(roof_lo * 1e3, 3),
                            round(roof_hi * 1e3, 3)],
            "pct_of_roofline": [round(100 * roof_lo / measured_s, 1),
                                round(100 * roof_hi / measured_s, 1)],
            "mfu_pct": round(100 * flops / measured_s / V5E_PEAK_FLOPS, 1),
            "hbm_util_pct": [
                round(100 * bytes_vis / measured_s / V5E_PEAK_BW, 1),
                round(100 * bytes_fx / measured_s / V5E_PEAK_BW, 1)],
        })
    return out


def train_part(args, forced_xla):
    """The bf16 mixed-precision arm of benchmarks/train_bench.py, one
    optimizer step at global batch 128 (ref protocol:
    score_sde_jax/README.md:42-47; our arm = results_train_v5e.json
    bf16_n1/bf16_n5)."""
    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu import configs, run_lib
    from dpm_solver_tpu.models import NCSNpp, NCSNppConfig
    from dpm_solver_tpu.score import get_score_fn
    from dpm_solver_tpu.training.losses import (make_score_train_step,
                                                sde_loss_fn)
    from dpm_solver_tpu.training.train import (make_optimizer,
                                               make_train_state)

    import dataclasses

    cfg = configs.get_config("score_sde_cifar10_ve_ncsnpp_continuous")
    tcfg = cfg.training
    mc = NCSNppConfig.tiny() if args.tiny else cfg.model_config
    if args.remat:
        mc = dataclasses.replace(mc, remat=True)
    side = mc.image_size if args.tiny else cfg.data.image_size
    sde = run_lib._make_sde(cfg)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.train_batch, side, side, 3)), jnp.float32)

    model = NCSNpp(config=mc, compute_dtype=jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, side, side, 3)), jnp.ones((1,)),
        deterministic=True))(jax.random.PRNGKey(1))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    score_fn = lambda p, x, t, r: get_score_fn(
        sde, lambda xx, tt: model.apply(
            p, xx, tt, deterministic=False, rngs={"dropout": r}),
        continuous=True)(x, t)
    loss_fn = sde_loss_fn(sde, score_fn, reduce_mean=tcfg.reduce_mean,
                          likelihood_weighting=tcfg.likelihood_weighting,
                          score_rng=True)
    tx = make_optimizer(tcfg.lr, tcfg.warmup, tcfg.grad_clip)
    state0, _ = make_train_state(params, ema_rate=tcfg.ema_rate, tx=tx)
    step = make_score_train_step(loss_fn, tx)

    compiled = jax.jit(step).lower(state0, x0, rng).compile()
    flops_vis, bytes_vis = _cost(compiled)
    with forced_xla():
        cfx = jax.jit(lambda s, x, r: step(s, x, r)).lower(
            state0, x0, rng).compile()
        flops_fx, bytes_fx = _cost(cfx)
    flops = max(flops_vis, flops_fx)  # axon sometimes returns empty tables

    measured = None
    if not args.cpu:
        fn = jax.jit(step, donate_argnums=(0,))
        state, metrics = fn(state0, x0, rng)
        float(jax.tree.leaves(metrics)[0].ravel()[0])  # device-side sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, metrics = fn(state, x0, rng)
        float(jax.tree.leaves(metrics)[0].ravel()[0])
        measured = (time.perf_counter() - t0) / args.reps

    out = _roofline_fields(flops, bytes_vis, bytes_fx, measured)
    # the fusion-proof floor: Adam+EMA state traffic alone (fp32 master
    # weights: read p/m/v/ema/grads, write p/m/v/ema)
    opt_bytes = 9 * 4 * n_params
    out.update({
        "remat": args.remat,
        "batch": args.train_batch,
        "params_m": round(n_params / 1e6, 1),
        "optimizer_traffic_floor_bytes": opt_bytes,
        "optimizer_traffic_floor_ms": round(
            opt_bytes / V5E_PEAK_BW * 1e3, 3),
        "unit": "one Adam+EMA step, NCSN++ VE continuous, bf16 compute",
    })
    print(f"# train step: {out}", file=sys.stderr, flush=True)
    return out


def guided_part(args, forced_xla):
    """One classifier-guided ADM model eval — the unit
    results_guided_v5e.json's 20-NFE trajectory repeats (UNet fwd +
    classifier fwd + classifier grad via jax.grad, wrapper.py
    cond_grad_fn; canonical config sample.sh:38-50)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu import NoiseScheduleVP, model_wrapper
    from dpm_solver_tpu.configs import get_config
    from dpm_solver_tpu.models import ADMClassifier, ADMUNet

    config = get_config("imagenet256_guided")
    mc, cc = config.model_config, config.classifier_config
    if args.tiny:
        mc = dataclasses.replace(
            mc, image_size=32, model_channels=32, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
            num_head_channels=-1)
        cc = dataclasses.replace(
            cc, image_size=32, model_channels=32, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,),
            num_head_channels=16)
    side = mc.image_size
    scale = config.sampling.classifier_scale

    unet = ADMUNet(config=mc, compute_dtype=jnp.bfloat16)
    clf = ADMClassifier(config=cc, compute_dtype=jnp.bfloat16)
    y = jnp.asarray(np.random.default_rng(1).integers(
        0, 1000, args.guided_batch), jnp.int32)
    uparams = jax.jit(lambda r: unet.init(
        r, jnp.zeros((1, side, side, 3)), jnp.ones((1,)), y[:1], None,
        deterministic=True))(jax.random.key(0))
    cparams = jax.jit(lambda r: clf.init(
        r, jnp.zeros((1, side, side, 3)), jnp.ones((1,)),
        deterministic=True))(jax.random.key(1))
    n_params = sum(x.size for x in jax.tree.leaves((uparams, cparams)))

    ns = NoiseScheduleVP.discrete(betas=config.diffusion.betas())
    tt = jnp.full((), 0.7, jnp.float32)

    def guided_eval(x, up, cp):
        def raw(xx, t):
            out = unet.apply(up, xx, t, y, None, deterministic=True)
            return out[..., :3]

        def log_prob(xx, t, yy):
            logits = clf.apply(cp, xx, t, deterministic=True)
            return jax.nn.log_softmax(logits, axis=-1)[
                jnp.arange(xx.shape[0]), yy]

        mf = model_wrapper(raw, ns, model_type="noise",
                           guidance_type="classifier", condition=y,
                           guidance_scale=scale, classifier_fn=log_prob)
        return mf(x, tt)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.guided_batch, side, side, 3)), jnp.float32)

    compiled = jax.jit(guided_eval).lower(x, uparams, cparams).compile()
    flops_vis, bytes_vis = _cost(compiled)
    with forced_xla():
        cfx = jax.jit(lambda xx, up, cp: guided_eval(xx, up, cp)).lower(
            x, uparams, cparams).compile()
        flops_fx, bytes_fx = _cost(cfx)
    flops = max(flops_vis, flops_fx)

    measured = None
    if not args.cpu:
        from benchmarks._timing import chain_time

        measured = chain_time(guided_eval, x, extras=(uparams, cparams),
                              iters=8, reps=args.reps)

    out = _roofline_fields(flops, bytes_vis, bytes_fx, measured)
    out.update({
        "batch": args.guided_batch, "image_size": side,
        "params_m": round(n_params / 1e6, 1),
        "unit": "one classifier-guided model eval (UNet + classifier "
                "fwd + classifier grad), imagenet256_guided scale 8",
    })
    print(f"# guided eval: {out}", file=sys.stderr, flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--part", choices=("train", "guided", "both"),
                   default="both")
    p.add_argument("--train-batch", type=int, default=128)
    p.add_argument("--guided-batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="per-resblock jax.checkpoint arm (the step is "
                        "HBM-bound; remat trades saved-activation bytes "
                        "for recompute on the idle MXU)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from benchmarks.roofline import forced_xla

    report = {"metric": "train_guided_bytes_roofline_v5e"}
    if args.part in ("train", "both"):
        report["train_step"] = train_part(args, forced_xla)
    if args.part in ("guided", "both"):
        report["guided_eval"] = guided_part(args, forced_xla)

    if not args.cpu:
        suffix = "_remat" if args.remat else ""
        out = (__file__.rsplit("/", 1)[0]
               + f"/results_roofline_train_guided{suffix}_v5e.json")
        # merge: a --part train run must not clobber an existing
        # guided_eval section (and vice versa)
        try:
            with open(out) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            prior = {}
        prior.update(report)
        with open(out, "w") as f:
            json.dump(prior, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
