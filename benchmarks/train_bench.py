"""Training-throughput bench: NCSN++ cont. VE — the exact configuration the
reference publishes training speed for (score_sde_jax/README.md:42-47,
BASELINE.md row 5): global batch 128, continuous score-matching loss with
live dropout, Adam + warmup + clipping, in-step EMA.

Reference published rows (4x V100 32GB, global batch 128):
  PyTorch                   0.56 s/step   (57 img/s per GPU)
  JAX  n_jitted_steps=1     0.30 s/step  (107 img/s per GPU)
  JAX  n_jitted_steps=5     0.20 s/step  (160 img/s per GPU)

Ours runs the same global batch on ONE v5e chip and reports s/step,
img/s/chip, and MFU; `vs_baseline` is img/s/chip over the reference JAX
row's img/s/GPU at the same n_jitted_steps — cross-hardware context, not a
same-silicon A/B (the solver benches are the A/Bs).

Arms: dtype {fp32, bf16 (our serving-style mixed precision: bf16 compute,
fp32 norms/master weights)} x n_jitted_steps {1, 5}.

Run on a TPU host: python benchmarks/train_bench.py [--reps 10]
Prints one JSON line (best arm as the headline, all arms in detail).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REF_ROWS = {  # s/step, 4x V100, global batch 128 (README.md:42-47)
    "torch": 0.56,
    "jax_n1": 0.30,
    "jax_n5": 0.20,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="smoke-test shapes (CI); numbers meaningless")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from dpm_solver_tpu import configs, run_lib
    from dpm_solver_tpu.models import NCSNpp, NCSNppConfig
    from dpm_solver_tpu.score import get_score_fn
    from dpm_solver_tpu.training.losses import (
        make_score_train_step,
        sde_loss_fn,
    )
    from dpm_solver_tpu.training.train import (
        make_multi_step,
        make_optimizer,
        make_train_state,
    )

    cfg = configs.get_config("score_sde_cifar10_ve_ncsnpp_continuous")
    tcfg = cfg.training
    mc = NCSNppConfig.tiny() if args.tiny else cfg.model_config
    side = mc.image_size if args.tiny else cfg.data.image_size
    sde = run_lib._make_sde(cfg)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, side, side, 3)), jnp.float32)

    arms = {}
    flops_per_step = {}
    for dtype in ("fp32", "bf16"):
        dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        model = NCSNpp(config=mc, compute_dtype=dt)
        params = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, side, side, 3)), jnp.ones((1,)),
            deterministic=True))(jax.random.PRNGKey(1))
        # run_lib.train's continuous branch, verbatim contract
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

        # roofline: one compiled train step's flops (fwd+bwd+optimizer);
        # dtype-independent op count, so reuse the fp32 count for bf16 if
        # the analysis comes back empty (axon quirk, cf. score_sde_bench)
        try:
            c = jax.jit(step).lower(state0, x0, rng).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops_per_step[dtype] = float(ca.get("flops", 0.0))
        except Exception as e:  # noqa: BLE001
            print(f"# cost analysis unavailable ({dtype}): {e}",
                  file=sys.stderr)
            flops_per_step[dtype] = 0.0
        if flops_per_step[dtype] == 0.0 and dtype == "bf16":
            flops_per_step[dtype] = flops_per_step.get("fp32", 0.0)

        for n_jit in (1, 5):
            if n_jit == 1:
                fn = jax.jit(step, donate_argnums=(0,))
                batch_arg = x0
            else:
                fn = jax.jit(make_multi_step(step, n_jit),
                             donate_argnums=(0,))
                batch_arg = jnp.broadcast_to(x0, (n_jit, *x0.shape))
            state = jax.tree.map(lambda a: jnp.array(a, copy=True), state0)
            state, metrics = fn(state, batch_arg, rng)  # compile + warm
            float(jax.tree.leaves(metrics)[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(args.reps):
                state, metrics = fn(state, batch_arg, rng)
            # device-scalar fetch: block through the axon tunnel
            # (block_until_ready does not; CLAUDE.md)
            float(jax.tree.leaves(metrics)[0].ravel()[0])
            dt_step = (time.perf_counter() - t0) / (args.reps * n_jit)
            key = f"{dtype}_n{n_jit}"
            peak = (None if jax.devices()[0].platform == "cpu"
                    else 197e12)  # v5e bf16
            fl = flops_per_step[dtype]
            arms[key] = {
                "s_per_step": round(dt_step, 4),
                "img_per_s_chip": round(args.batch / dt_step, 1),
                "flops_per_step": fl,
                "implied_tflops": round(fl / dt_step / 1e12, 2),
                "mfu": round(fl / dt_step / peak, 4) if peak else None,
            }
            print(f"# {key}: {dt_step*1e3:.1f} ms/step "
                  f"({args.batch/dt_step:.0f} img/s, "
                  f"{fl/dt_step/1e12:.1f} TF/s)", file=sys.stderr, flush=True)

    best_key = min(arms, key=lambda k: arms[k]["s_per_step"])
    best = arms[best_key]
    n_jit = 5 if best_key.endswith("n5") else 1
    ref = REF_ROWS[f"jax_n{n_jit}"]
    ref_img_s_gpu = args.batch / ref / 4.0
    print(json.dumps({
        "metric": "ncsnpp_ve_train_img_per_s_per_chip",
        "value": best["img_per_s_chip"],
        "unit": "img/s",
        "vs_baseline": round(best["img_per_s_chip"] / ref_img_s_gpu, 3),
        "baseline": f"reference JAX n_jitted={n_jit} on V100 "
                    f"({ref_img_s_gpu:.0f} img/s/GPU) — cross-hardware",
        "batch": args.batch,
        "best_arm": best_key,
        "arms": arms,
        "ref_rows_s_per_step_4xV100": REF_ROWS,
    }))


if __name__ == "__main__":
    main()
