"""Multi-host (pod) coordination utilities.

The reference coordinates hosts with per-host rng folding, per-host sample
dirs, and a GCS file-existence barrier (score_sde_jax/run_lib.py:144,312,
426-433,564-568). Single-controller JAX replaces all of that with
collectives; these helpers wrap the standard patterns so run_lib and eval
loops stay host-count-agnostic (they are no-ops on one host).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def host_fold(rng, *, host_id: int | None = None):
    """Per-host rng stream (ref jax.random.fold_in(rng, jax.host_id()))."""
    return jax.random.fold_in(
        rng, jax.process_index() if host_id is None else host_id)


def allgather_metrics(tree: Any) -> Any:
    """Gather per-host metric pytrees onto every host (replaces the
    reference's save-stats-to-GCS + host-0 aggregation, run_lib.py:507-563).
    Leaves gain a leading [n_hosts] axis."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: np.asarray(a)[None], tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(np.asarray,
                        multihost_utils.process_allgather(tree))


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (replaces the file-existence barrier,
    run_lib.py:564-568)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_subset(items, *, host_id: int | None = None, n_hosts: int | None = None):
    """Shard a host-side work list across processes (per-host sampling
    rounds / file shards, ref run_lib.py:452-503)."""
    h = jax.process_index() if host_id is None else host_id
    n = jax.process_count() if n_hosts is None else n_hosts
    return [x for i, x in enumerate(items) if i % n == h]
