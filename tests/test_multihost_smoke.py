"""Real multi-process `jax.distributed` smoke (VERDICT r1 #9): two CPU
processes x 4 virtual devices run parallel/multihost.py's helpers — global
sharded-array collective, per-host rng-fold distinctness, work-list
sharding, collective barrier. Subprocess-based so the test session's own
JAX backend is untouched."""

import os


def test_two_process_multihost_smoke():
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multihost(2)
