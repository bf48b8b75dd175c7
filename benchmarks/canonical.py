"""Assemble the one-file canonical perf table: the four BASELINE benchmark
configurations plus training, each row sourced from its freshest committed
measurement artifact (never re-measured here — this is a collector, so the
provenance path rides along with every number).

Canonical configs (BASELINE.md):
  cifar10_multistep     ddpm_and_guided-diffusion/sample.sh:6-17
  imagenet64_iddpm      ddpm_and_guided-diffusion/sample.sh:19-33
  imagenet256_guided    ddpm_and_guided-diffusion/sample.sh:38-50
  score_sde_singlestep  score_sde_jax/sample.sh:1-10
  sd21_20nfe            examples/stable-diffusion (README.md:141)
  ncsnpp_ve_train       score_sde_jax/README.md:42-47

Writes benchmarks/results_canonical_v5e.json and prints it.
Run: python benchmarks/canonical.py   (host-only; no chip access needed)
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B = os.path.join(REPO, "benchmarks")

# row -> ordered candidate sources (first parseable JSON line wins)
SOURCES = {
    "cifar10_multistep": [
        os.path.join(B, "chip_logs", "headline.log"),
        # driver artifacts, newest round first
        *sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), reverse=True),
    ],
    "imagenet64_iddpm": [
        os.path.join(B, "results_imagenet64_v5e.json"),
        os.path.join(B, "chip_logs", "imagenet64.log"),
    ],
    "imagenet256_guided": [
        os.path.join(B, "results_guided_v5e.json"),
        os.path.join(B, "chip_logs", "guided.log"),
    ],
    "score_sde_singlestep_fp32": [
        os.path.join(B, "results_score_sde_fp32_v5e.json"),
    ],
    "score_sde_serving_bf16": [
        os.path.join(B, "chip_logs", "serving.log"),
        os.path.join(B, "results_score_sde_serving_v5e.json"),
    ],
    "sd21_20nfe": [
        os.path.join(B, "results_sd_batch4_v5e.json"),
        os.path.join(B, "chip_logs", "sd_bench.log"),
    ],
    "ncsnpp_ve_train": [
        os.path.join(B, "results_train_v5e.json"),
        os.path.join(B, "chip_logs", "train.log"),
    ],
}

KEEP = ("metric", "value", "unit", "vs_baseline", "baseline", "mfu",
        "implied_tflops", "batch", "dtype", "quant", "best_arm",
        "vs_baseline_matched", "matched_note", "weights")


def _scan_lines(text):
    for line in reversed([l.strip() for l in text.splitlines()]):
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in d or "value" in d:
            return d
    return None


def last_json_line(path):
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return None
    try:
        whole = json.loads(text)
    except json.JSONDecodeError:
        whole = None
    if isinstance(whole, dict):
        if "metric" in whole:
            return whole
        # driver BENCH_r*.json wraps the bench's stdout in a 'tail' field
        if isinstance(whole.get("tail"), str):
            return _scan_lines(whole["tail"])
        return None
    return _scan_lines(text)


def main():
    rows = {}
    for name, candidates in SOURCES.items():
        for path in candidates:
            d = last_json_line(path)
            if d is None:
                continue
            row = {k: d[k] for k in KEEP if k in d}
            # nested roofline fields (train_bench keeps them per-arm)
            if "mfu" not in row and isinstance(d.get("arms"), dict):
                best = d.get("best_arm")
                if best in d["arms"]:
                    row["mfu"] = d["arms"][best].get("mfu")
                    row["implied_tflops"] = d["arms"][best].get(
                        "implied_tflops")
            row["source"] = os.path.relpath(path, REPO)
            rows[name] = row
            break
        else:
            rows[name] = {"status": "NO ARTIFACT — not yet measured"}

    out = {"metric": "canonical_results_v5e", "rows": rows}
    path = os.path.join(B, "results_canonical_v5e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    missing = [k for k, v in rows.items() if "status" in v]
    if missing:
        print(f"# missing rows: {missing}", file=sys.stderr)


if __name__ == "__main__":
    main()
