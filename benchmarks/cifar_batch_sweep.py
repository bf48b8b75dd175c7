"""CIFAR headline batch-size scaling: ours vs the reference JAX solver.

bench.py's headline times batch 64, but the reference's own canonical FID
protocol runs batch 1000 across 2 GPUs (= 500/device;
ddpm_and_guided-diffusion/configs/cifar10.yml:42-48 + sample.sh DEVICES).
This sweep measures both arms at batches 64..512 in ONE session so the
headline batch can be chosen from the reference's protocol rather than an
arbitrary small batch — and so vs_baseline stays a same-batch, same-session
A/B at every point.

Run on a TPU host: python benchmarks/cifar_batch_sweep.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

BATCHES = (64, 128, 256, 512)


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench._device_health_check()
    try:
        from benchmarks._cache import enable_compile_cache

        enable_compile_cache()
    except Exception:  # noqa: BLE001
        pass

    from dpm_solver_tpu import NoiseScheduleVP

    betas = np.linspace(1e-4, 0.02, 1000)
    ns = NoiseScheduleVP.discrete(betas=betas)
    raw_model = bench.build_model()
    flops1 = bench.model_eval_flops(
        raw_model, jnp.zeros((BATCHES[0], 32, 32, 3)))

    rows = {}
    for b in BATCHES:
        x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, 32, 32, 3)), jnp.float32)
        # each arm is fenced: a tunnel drop mid-sweep keeps every batch
        # already measured (the first attempt lost 3 completed timings)
        try:
            t_ours = bench.bench_ours(raw_model, ns, x_T)
        except Exception as e:  # noqa: BLE001 — record and move on
            rows[str(b)] = {"ours": f"FAILED: {type(e).__name__}"}
            print(f"# b{b} ours FAILED: {e}", file=sys.stderr, flush=True)
            continue
        flops = bench.STEPS * flops1 * (b / BATCHES[0])
        tfs = flops / t_ours / 1e12
        rows[str(b)] = {
            "ours_ms_batch": round(t_ours * 1e3, 1),
            "ours_samples_s": round(b / t_ours, 1),
            "tflops_s": round(tfs, 1),
            "mfu": round(tfs / 197, 4),
        }
        try:
            t_ref = bench.bench_reference_jax(raw_model, betas, x_T)
            rows[str(b)]["ref_samples_s"] = round(b / t_ref, 1)
            rows[str(b)]["vs_ref"] = round(t_ref / t_ours, 3)
        except Exception as e:  # noqa: BLE001
            rows[str(b)]["ref"] = f"FAILED: {type(e).__name__}"
        print(f"# b{b}: {rows[str(b)]}", file=sys.stderr, flush=True)

    done = [k for k in rows if "ours_samples_s" in rows[k]]
    if not done:
        raise SystemExit("no batch completed")
    best = max(done, key=lambda k: rows[k]["ours_samples_s"])
    print(json.dumps({
        "metric": "cifar10_10nfe_batch_sweep",
        "value": rows[best]["ours_samples_s"],
        "unit": "samples/s (best batch)",
        "best_batch": int(best),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
