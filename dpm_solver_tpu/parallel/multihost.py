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


def _smoke_worker(process_id: int, num_processes: int, port: int) -> None:
    """One process of the multi-host smoke: real `jax.distributed` over CPU
    (4 local virtual devices per process), exercising every helper above
    plus a cross-host collective on a global sharded array. Launched by
    `__graft_entry__.dryrun_multihost`; prints MULTIHOST_OK on success."""
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes
    n_local = jax.local_device_count()
    assert jax.device_count() == num_processes * n_local

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, PartitionSpec("data"))

    # global array assembled from per-host shards; jit reduction over it is
    # a real cross-host collective (GSPMD inserts the all-reduce)
    local = np.full((n_local, 2), float(jax.process_index()), np.float32)
    garr = jax.make_array_from_process_local_data(sh, local)
    total = float(jax.jit(jnp.sum)(garr))
    expect = sum(2.0 * n_local * p for p in range(num_processes))
    assert total == expect, (total, expect)

    # per-host rng folding: every host's stream must differ, and
    # allgather_metrics must deliver all of them everywhere
    key = host_fold(jax.random.key(0))
    rows = allgather_metrics(np.asarray(jax.random.key_data(key)))
    assert rows.shape[0] == num_processes
    assert len({tuple(np.asarray(r).ravel()) for r in rows}) == num_processes

    # work-list sharding: subsets partition the list exactly
    sub = host_subset(list(range(10)))
    counts = allgather_metrics(np.asarray([len(sub)], np.int64))
    assert int(np.sum(counts)) == 10

    barrier("multihost-smoke")
    print(f"MULTIHOST_OK {process_id}", flush=True)
