from dpm_solver_tpu.pipelines.stable_diffusion import (
    DPMSolverSampler,
    LatentDiffusion,
    StableDiffusionPipeline,
    class_conditional_sample,
    load_sd_checkpoint,
    make_ldm_betas,
)

__all__ = [
    "DPMSolverSampler",
    "LatentDiffusion",
    "StableDiffusionPipeline",
    "class_conditional_sample",
    "load_sd_checkpoint",
    "make_ldm_betas",
]
