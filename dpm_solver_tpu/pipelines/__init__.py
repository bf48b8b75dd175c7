from dpm_solver_tpu.pipelines.cascade import CascadePipeline, CascadeStage
from dpm_solver_tpu.pipelines.diffedit import compute_edit_mask, diffedit
from dpm_solver_tpu.pipelines.retrieval import (
    Searcher,
    build_image_database,
    knn2img,
)
from dpm_solver_tpu.pipelines.stable_diffusion import (
    DPMSolverSampler,
    LatentDiffusion,
    StableDiffusionPipeline,
    class_conditional_sample,
    load_sd_checkpoint,
    make_ldm_betas,
)

__all__ = [
    "CascadePipeline",
    "CascadeStage",
    "Searcher",
    "build_image_database",
    "knn2img",
    "DPMSolverSampler",
    "LatentDiffusion",
    "StableDiffusionPipeline",
    "class_conditional_sample",
    "compute_edit_mask",
    "diffedit",
    "load_sd_checkpoint",
    "make_ldm_betas",
]
