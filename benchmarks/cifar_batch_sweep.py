"""CIFAR headline batch-size scaling: ours vs the reference JAX solver.

bench.py's headline times batch 64, but the reference's own canonical FID
protocol runs batch 1000 across 2 GPUs (= 500/device;
ddpm_and_guided-diffusion/configs/cifar10.yml:42-48 + sample.sh DEVICES).
This sweep measures both arms at batches 64..512 so the headline batch is
chosen from the reference's protocol rather than an arbitrary small one.

EVERY (batch, arm) RUNS IN ITS OWN PROCESS, merging into
results_cifar_batch_sweep_v5e.json. Two prior attempts established why:
the reference arm's unrolled 10-eval program hits TPU INTERNAL backend
errors at larger batches (b128 here, b500 on ImageNet64 — reproducible),
and the error WEDGES the JAX client, so anything sharing the process
afterwards fails too (the first sweep lost b256/b512 to it).

Run on a TPU host: python benchmarks/cifar_batch_sweep.py
(drives the per-arm subprocesses; or --batch N --arm ours|ref for one).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

BATCHES = (64, 128, 256, 512)
RESULTS = __file__.rsplit("/", 1)[0] + "/results_cifar_batch_sweep_v5e.json"


def run_one(batch, arm):
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
    x_T = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 32, 32, 3)), jnp.float32)

    doc = {"metric": "cifar10_10nfe_batch_sweep", "rows": {}}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            doc = json.load(f)
    row = doc["rows"].setdefault(str(batch), {})

    if arm == "ours":
        t_ours = bench.bench_ours(raw_model, ns, x_T)
        flops1 = bench.model_eval_flops(
            raw_model, jnp.zeros((batch, 32, 32, 3)))
        tfs = bench.STEPS * flops1 / t_ours / 1e12
        row.update({
            "ours_ms_batch": round(t_ours * 1e3, 1),
            "ours_samples_s": round(batch / t_ours, 1),
            "tflops_s": round(tfs, 1),
            "mfu": round(tfs / 197, 4),
        })
        if "ref_samples_s" in row:  # keep the A/B ratio current
            row["vs_ref"] = round(
                (batch / row["ref_samples_s"]) / t_ours, 3)
    else:
        t_ref = bench.bench_reference_jax(raw_model, betas, x_T)
        row["ref_samples_s"] = round(batch / t_ref, 1)
        if "ours_ms_batch" in row:
            row["vs_ref"] = round(
                t_ref * 1e3 / row["ours_ms_batch"], 3)
    print(f"# b{batch} {arm}: {row}", file=sys.stderr, flush=True)

    done = [k for k, r in doc["rows"].items() if "ours_samples_s" in r]
    if done:
        best = max(done, key=lambda k: doc["rows"][k]["ours_samples_s"])
        doc.update({"value": doc["rows"][best]["ours_samples_s"],
                    "unit": "samples/s (best batch)",
                    "best_batch": int(best)})
    with open(RESULTS, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--arm", choices=("ours", "ref"), default=None)
    args = p.parse_args()
    if args.batch:
        run_one(args.batch, args.arm or "ours")
        return
    # driver mode: one subprocess per (batch, arm) — INTERNAL-error
    # isolation (see module docstring). Arms already recorded are kept
    # (delete the results file for a fresh sweep).
    have = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            have = json.load(f).get("rows", {})
    for b in BATCHES:
        for arm, key in (("ours", "ours_samples_s"), ("ref", "ref_samples_s")):
            if key in have.get(str(b), {}) or \
                    have.get(str(b), {}).get(f"{arm}_failed"):
                continue
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--batch", str(b),
                     "--arm", arm], timeout=1800)
                rc = r.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout-1800s"
            if rc:
                print(f"# b{b} {arm}: FAILED rc={rc} "
                      "(recorded rows survive)", file=sys.stderr, flush=True)
                doc = {"metric": "cifar10_10nfe_batch_sweep", "rows": {}}
                if os.path.exists(RESULTS):
                    with open(RESULTS) as f:
                        doc = json.load(f)
                doc["rows"].setdefault(str(b), {})[f"{arm}_failed"] = (
                    f"rc={rc} (reference arm INTERNAL errors at "
                    "large batches are reproducible — see docstring)"
                    if arm == "ref" else f"rc={rc}")
                with open(RESULTS, "w") as f:
                    json.dump(doc, f, indent=1)
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            print(json.dumps(json.load(f)))


if __name__ == "__main__":
    main()
