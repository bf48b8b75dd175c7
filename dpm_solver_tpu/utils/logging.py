"""Observability: metrics writers, image grids, profiler annotations.

TPU-native equivalent of the reference's logging spread (SURVEY.md §5):
TensorBoard writers (score_sde run_lib.py:34,68,165; ddpm main.py:164), the
multi-format KV logger (guided_diffusion/logger.py:26-490), image-grid
savers (score_sde utils.py:51-101), and the vestigial CUDA-event timers
(runners/diffusion.py:426-449) — replaced by `jax.profiler` traces.
NFE counting is returned data (samplers return nfe scalars), not a host
callback like the reference's `host_callback.id_print`
(dpm_solver_jax.py:962-963).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import numpy as np


class MetricWriter:
    """Scalars to JSONL (always) + optional CSV / stdout / TensorBoard.

    The format set mirrors the reference KV logger's human/JSON/CSV/TB
    writers (guided_diffusion/logger.py:26-490, sans the MPI plumbing — a
    single-controller JAX program has one writer). JSONL is the
    machine-readable ground truth; the CSV re-writes its header when new
    keys appear, like the reference's CSVOutputFormat (:121-150)."""

    def __init__(self, logdir: str, *, tensorboard: bool = True,
                 csv: bool = False, stdout: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._csv_path = os.path.join(logdir, "metrics.csv") if csv else None
        self._csv_keys = []
        self._csv_rows = []
        self._stdout = stdout
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(logdir)
            except ImportError:
                pass

    def _write_csv(self) -> None:
        with open(self._csv_path, "w") as f:
            f.write(",".join(["step"] + self._csv_keys) + "\n")
            for row in self._csv_rows:
                f.write(",".join(str(row.get(k, "")) for k in
                                 ["step"] + self._csv_keys) + "\n")

    def write(self, step: int, **scalars) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._csv_path is not None:
            new_keys = [k for k in scalars if k not in self._csv_keys]
            self._csv_keys.extend(sorted(new_keys))
            self._csv_rows.append({"step": int(step),
                                   **{k: float(v) for k, v in scalars.items()}})
            self._write_csv()
        if self._stdout:
            kv = " | ".join(f"{k} {float(v):.6g}"
                            for k, v in sorted(scalars.items()))
            print(f"step {int(step):>9} | {kv}", flush=True)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def image_grid(images: np.ndarray, *, ncols: Optional[int] = None,
               pad: int = 2) -> np.ndarray:
    """[B,H,W,C] in [0,1] -> one [gH,gW,C] grid (ref utils.py:51-101)."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    ncols = ncols or int(np.ceil(np.sqrt(b)))
    nrows = int(np.ceil(b / ncols))
    grid = np.ones((nrows * (h + pad) - pad, ncols * (w + pad) - pad, c),
                   images.dtype)
    for i, img in enumerate(images):
        r, k = divmod(i, ncols)
        grid[r * (h + pad):r * (h + pad) + h,
             k * (w + pad):k * (w + pad) + w] = img
    return grid


def save_image_grid(images: np.ndarray, path: str, **kwargs) -> None:
    grid = image_grid(images, **kwargs)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)
    try:
        from PIL import Image
    except ImportError:
        np.save(path + ".npy", arr)
        return
    Image.fromarray(arr.squeeze()).save(path)


@contextlib.contextmanager
def trace_span(name: str):
    """jax.profiler annotation visible in TensorBoard/XProf traces
    (replaces the reference's commented CUDA-event timing blocks)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def wall_timer():
    """Host wall-clock for coarse phase timing; yields a dict filled on exit."""
    out = {}
    t0 = time.perf_counter()
    yield out
    out["seconds"] = time.perf_counter() - t0
