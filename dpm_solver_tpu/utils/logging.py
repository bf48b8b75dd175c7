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
    """Scalars to JSONL (always) + TensorBoard (if tensorflow is present).

    JSONL is the machine-readable ground truth; TB is the human view."""

    def __init__(self, logdir: str, *, tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(logdir)
            except ImportError:
                pass

    def write(self, step: int, **scalars) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
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
