"""dpm_solver_tpu: a TPU-native (JAX/XLA/Pallas/pjit) DPM-Solver framework.

From-scratch rebuild of the capabilities of LuChengTHU/dpm-solver with a
TPU-first design: the full sampling trajectory compiles to a single XLA
program (host-precomputed coefficient tables + `lax.scan`), batches shard over
a `jax.sharding.Mesh` via pjit, and hot elementwise update rules fuse into
Pallas kernels.

Public API (mirrors the reference's three symbols, plus the functional layer):
    NoiseScheduleVP   -- alpha/sigma/lambda(t) bijection      (schedule.py)
    model_wrapper     -- parameterization + guidance adapter  (wrapper.py)
    DPM_Solver        -- solver object with .sample/.inverse  (solver/)
"""

from dpm_solver_tpu.schedule import (
    NoiseScheduleVP,
    expand_dims,
    interp_linear_extrap,
    interpolate_fn,
)
from dpm_solver_tpu.solver import DPM_Solver, build_sampler
from dpm_solver_tpu.wrapper import model_wrapper

__all__ = [
    "DPM_Solver",
    "NoiseScheduleVP",
    "build_sampler",
    "expand_dims",
    "interp_linear_extrap",
    "interpolate_fn",
    "model_wrapper",
]
__version__ = "0.1.0"
