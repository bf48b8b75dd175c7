"""Checkpointing + preemption recovery (orbax-backed).

TPU-native equivalent of the reference's four persistence mechanisms
(SURVEY.md §5): flax `save/restore_checkpoint` of the training State incl.
EMA + rng (score_sde_jax/run_lib.py:83-90,167-194,365), the high-frequency
preemption meta-checkpoint (:167-173), the `EvalMeta` dataclass that makes
evaluation/sampling rounds resumable after preemption (:314-346,426-433),
and the checkpoint-arrival polling loop (:353-372).

Design deltas: orbax (atomic, async-capable, multi-host-aware) instead of
flax.training.checkpoints; EvalMeta is a plain JSON sidecar (it is tiny
host-state — rng key data + three counters — and JSON survives version
skew better than pickled dataclasses)."""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-keyed checkpoints of any pytree (TrainState, params, ...)."""

    def __init__(self, directory: str, *, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, tree: Any, *, wait: bool = True) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, tree_like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(tree_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())


def restore_or_init(manager: CheckpointManager, init_tree: Any) -> Any:
    """Preemption-safe start: restore the latest checkpoint if one exists,
    else return the freshly initialized tree (ref run_lib.py:83-90)."""
    if manager.latest_step() is None:
        return init_tree
    return manager.restore(init_tree)


def wait_for_checkpoint(manager: CheckpointManager, step: int, *,
                        poll_seconds: float = 60.0,
                        timeout: Optional[float] = None) -> bool:
    """Block until checkpoint `step` exists (ref polling loop,
    run_lib.py:353-372). Returns False on timeout."""
    t0 = time.time()
    while True:
        latest = manager.latest_step()
        if latest is not None and latest >= step:
            return True
        if timeout is not None and time.time() - t0 > timeout:
            return False
        time.sleep(poll_seconds)


@dataclasses.dataclass
class EvalMeta:
    """Resumable-evaluation progress (ref run_lib.py:314-346): which
    checkpoint / sampling round / bpd round to continue from, plus the rng
    so restarted rounds reproduce the same samples."""

    ckpt_id: int = 0
    sampling_round_id: int = -1
    bpd_round_id: int = -1
    rng_key_data: tuple = (0, 0)

    @property
    def rng(self):
        return jax.random.wrap_key_data(
            np.asarray(self.rng_key_data, dtype=np.uint32))

    def with_rng(self, rng) -> "EvalMeta":
        data = tuple(int(v) for v in np.asarray(
            jax.random.key_data(rng)).reshape(-1))
        return dataclasses.replace(self, rng_key_data=data)


def save_eval_meta(meta: EvalMeta, directory: str, *,
                   host_id: Optional[int] = None) -> str:
    """Atomic JSON write, per-host file names on pods
    (ref per-host prefixes, run_lib.py:426-433)."""
    host_id = jax.process_index() if host_id is None else host_id
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"eval_meta_host{host_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dataclasses.asdict(meta), f)
    os.replace(tmp, path)
    return path


def load_eval_meta(directory: str, *,
                   host_id: Optional[int] = None) -> EvalMeta:
    host_id = jax.process_index() if host_id is None else host_id
    path = os.path.join(directory, f"eval_meta_host{host_id}.json")
    if not os.path.exists(path):
        return EvalMeta()
    with open(path) as f:
        d = json.load(f)
    d["rng_key_data"] = tuple(d.get("rng_key_data", (0, 0)))
    return EvalMeta(**d)


def delete_eval_meta(directory: str, *, host_id: Optional[int] = None) -> None:
    """Remove the progress marker once evaluation completes
    (ref run_lib.py:591-595)."""
    host_id = jax.process_index() if host_id is None else host_id
    path = os.path.join(directory, f"eval_meta_host{host_id}.json")
    if os.path.exists(path):
        os.remove(path)
