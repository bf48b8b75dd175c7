"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (fast iteration, no TPU contention) with 8 virtual
devices so multi-chip sharding paths are exercised without hardware, per the
standard JAX trick the reference never needed (it had no tests at all —
SURVEY.md §4).

Env vars must be set before `jax` is imported anywhere in the test process.
"""

import os

# The image pins JAX_PLATFORMS=axon (single real TPU via tunnel) and imports
# jax at interpreter startup, so env-var overrides here are too late for
# jax's import-time config read. Use jax.config.update instead — the backend
# itself is only initialized on first device use, which happens inside tests,
# so XLA_FLAGS (read at backend init) still takes effect via os.environ.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by repeated XLA
# compiles of the same tiny models; cache hits cut re-runs by minutes
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")

if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def has_reference() -> bool:
    return (REFERENCE_ROOT / "dpm_solver_pytorch.py").exists()


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted at /root/reference"
)


@pytest.fixture(scope="session")
def reference_torch_module():
    """Import the reference PyTorch solver for golden-value comparison.

    The reference is used strictly as a *test oracle* (never vendored): we run
    its fp32 CPU implementation side by side with ours and require 1e-4
    trajectory agreement (BASELINE.md target).
    """
    if not has_reference():
        pytest.skip("reference not available")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_dpm_solver_pytorch", REFERENCE_ROOT / "dpm_solver_pytorch.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
