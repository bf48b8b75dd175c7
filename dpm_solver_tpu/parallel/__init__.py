from dpm_solver_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_sampler,
    replicate,
)
from dpm_solver_tpu.parallel.rng import per_process_key, sample_noise

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_sharded_sampler",
    "per_process_key",
    "replicate",
    "sample_noise",
]
