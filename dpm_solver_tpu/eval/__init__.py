from dpm_solver_tpu.eval.fid import (
    compute_statistics,
    fid_from_features,
    frechet_distance,
    frechet_distance_jax,
    inception_score,
    kid_from_features,
    load_statistics,
)

__all__ = [
    "compute_statistics",
    "fid_from_features",
    "frechet_distance",
    "frechet_distance_jax",
    "inception_score",
    "kid_from_features",
    "load_statistics",
]
