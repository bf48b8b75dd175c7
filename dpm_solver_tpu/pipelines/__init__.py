from dpm_solver_tpu.pipelines.stable_diffusion import (
    DPMSolverSampler,
    LatentDiffusion,
    StableDiffusionPipeline,
    load_sd_checkpoint,
    make_ldm_betas,
)

__all__ = [
    "DPMSolverSampler",
    "LatentDiffusion",
    "StableDiffusionPipeline",
    "load_sd_checkpoint",
    "make_ldm_betas",
]
