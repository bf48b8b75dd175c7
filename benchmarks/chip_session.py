"""Run the queued on-chip measurements (benchmarks/CHIP_TODO.md) in order.

The tunneled v5e chip drops unpredictably (CLAUDE.md documents the failure
mode: first device use hangs).  This driver makes a chip window productive
hands-off:

  * health-checks the chip in a subprocess with a hard timeout before each
    item (a hang never wedges the session);
  * runs each queued bench as a subprocess, teeing stdout/stderr to
    benchmarks/chip_logs/<item>.log;
  * records per-item status + wall time incrementally in
    benchmarks/chip_logs/session.json so a mid-run tunnel drop loses nothing
    already measured.

Usage:  python benchmarks/chip_session.py [--only item1,item3] [--skip-health]

Items (see CHIP_TODO.md for the rationale and the follow-up wiring rules):
  sd_bench      A/B per-step baseline + roofline fields (post-GEGLU/conv3x3)
  sd_profile    stage split for the README table
  geglu         per-site GEGLU kernel A/B -> results_geglu_v5e.json
  ln_linear     per-site LN->Linear kernel A/B -> results_ln_linear_v5e.json
  convergence   UniPC quality rows for QUALITY_r3
  headline      python bench.py (CIFAR multistep A/B sanity)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, "benchmarks", "chip_logs")

HEALTH_SRC = (
    "import jax, jax.numpy as jnp; x = jnp.ones((256, 256));"
    " print('HEALTH_OK', float((x @ x).ravel()[0]))"
)

# (name, argv, timeout_s) — order matches CHIP_TODO.md.
ITEMS = [
    ("sd_bench", [sys.executable, "benchmarks/sd_bench.py"], 3600),
    ("sd_profile", [sys.executable, "benchmarks/sd_profile.py"], 3600),
    ("geglu", [sys.executable, "benchmarks/geglu_bench.py"], 2400),
    ("ln_linear", [sys.executable, "benchmarks/ln_linear_bench.py"], 2400),
    ("convergence", [sys.executable, "benchmarks/convergence.py"], 5400),
    ("headline", [sys.executable, "bench.py"], 3600),
    ("quant", [sys.executable, "benchmarks/quant_bench.py"], 3600),
    ("sd_bench_w8a8",
     [sys.executable, "benchmarks/sd_bench.py", "--quant", "w8a8"], 3600),
    ("attn_variants",
     [sys.executable, "benchmarks/attn_variants_bench.py"], 2400),
    ("train", [sys.executable, "benchmarks/train_bench.py"], 3600),
    ("serving",
     [sys.executable, "benchmarks/score_sde_bench.py", "--serving"], 3600),
    ("guided", [sys.executable, "benchmarks/guided_bench.py"], 3600),
    # round-4 queue (VERDICT r3 items 1, 4, 5, 8, and the roofline #2)
    ("guided_ref",
     [sys.executable, "benchmarks/guided_bench.py", "--reference-arm"], 5400),
    ("vae_encode", [sys.executable, "benchmarks/vae_encode_bench.py"], 2400),
    ("sd_profile_b8",
     [sys.executable, "benchmarks/sd_profile.py", "--batch", "8"], 3600),
    ("attn_out_fused",
     [sys.executable, "benchmarks/attn_out_fused_bench.py"], 2400),
    ("roofline", [sys.executable, "benchmarks/roofline.py"], 3600),
    # bf16 weight residency (round 4): halves the 866M UNet's param HBM
    # footprint — the batch-8 profile put the fp32-weights program within
    # ~2 GB of HBM capacity (results_sd_stage_profile_b8_v5e.json)
    ("sd_bench_wbf16",
     [sys.executable, "benchmarks/sd_bench.py", "--weights", "bf16"], 5400),
    ("sd_bench_wbf16_b8",
     [sys.executable, "benchmarks/sd_bench.py", "--weights", "bf16",
      "--batch", "8"], 5400),
    # chain-timed tile re-sweeps: the committed per-call sweeps are
    # dispatch-inflated (annotated r4); a dispatch-free sweep may rank
    # tiles differently
    ("attn_sweep_chain_9216",
     [sys.executable, "benchmarks/attn_sweep.py", "--chain",
      "--shape", "40,9216,64"], 3600),
    ("attn_sweep_chain_2304",
     [sys.executable, "benchmarks/attn_sweep.py", "--chain",
      "--shape", "80,2304,64"], 3600),
    # the last canonical sample.sh config (imagenet64 i-DDPM cosine) +
    # the CIFAR headline at reference-protocol batches (both arms/session)
    ("imagenet64", [sys.executable, "benchmarks/imagenet64_bench.py"], 5400),
    ("cifar_batch_sweep",
     [sys.executable, "benchmarks/cifar_batch_sweep.py"], 3600),
    # assembles results_canonical_v5e.json from the freshest artifacts —
    # run last (host-only, no chip needed)
    ("canonical", [sys.executable, "benchmarks/canonical.py"], 600),
]


def chip_healthy(timeout=180):
    try:
        out = subprocess.run(
            [sys.executable, "-c", HEALTH_SRC],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False, "health check hung (tunnel down)"
    if out.returncode == 0 and "HEALTH_OK 256.0" in out.stdout:
        return True, "ok"
    return False, (out.stdout + out.stderr)[-500:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", help="comma-separated subset of item names")
    p.add_argument("--skip-health", action="store_true")
    p.add_argument("--health-timeout", type=int, default=180)
    args = p.parse_args()

    os.makedirs(LOGDIR, exist_ok=True)
    session_path = os.path.join(LOGDIR, "session.json")
    session = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "items": {}}

    def save():
        with open(session_path, "w") as f:
            json.dump(session, f, indent=1)

    wanted = set(args.only.split(",")) if args.only else None
    for name, argv, timeout in ITEMS:
        if wanted is not None and name not in wanted:
            continue
        if not args.skip_health:
            ok, why = chip_healthy(args.health_timeout)
            if not ok:
                print(f"[chip_session] ABORT before {name}: {why}",
                      flush=True)
                session["items"][name] = {"status": "skipped_tunnel_down",
                                          "why": why}
                save()
                break
        log_path = os.path.join(LOGDIR, f"{name}.log")
        print(f"[chip_session] running {name}: {' '.join(argv)}"
              f" (log: {log_path})", flush=True)
        t0 = time.time()
        with open(log_path, "w") as log:
            try:
                rc = subprocess.run(argv, stdout=log,
                                    stderr=subprocess.STDOUT,
                                    timeout=timeout, cwd=REPO).returncode
                status = "ok" if rc == 0 else f"exit_{rc}"
            except subprocess.TimeoutExpired:
                status = "timeout"
        dt = time.time() - t0
        print(f"[chip_session] {name}: {status} in {dt:.0f}s", flush=True)
        session["items"][name] = {"status": status, "seconds": round(dt, 1),
                                  "log": log_path}
        save()
        # Show the tail so the transcript carries the numbers.
        with open(log_path) as f:
            tail = f.read()[-2000:]
        print(f"[chip_session] tail of {name}:\n{tail}", flush=True)

    print(f"[chip_session] done; summary at {session_path}", flush=True)


if __name__ == "__main__":
    main()
