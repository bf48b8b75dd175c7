"""Cascaded pixel-space diffusion (DeepFloyd-IF style).

The reference README's north-star usage is DeepFloyd-IF stage 1 sampled with
SDE-DPM-Solver++ and upsampler stages conditioned on the previous stage's
output (README.md:46-79); the repo itself ships only the SuperResModel
conditioning pattern (guided_diffusion/unet.py:666-680). This module is the
generic cascade: a base text/class-conditional stage followed by
super-resolution stages, each an independently configured DPM-Solver run,
with the reference's noise-augmentation conditioning on the upsampled input.

Every stage's trajectory is one XLA program; stages chain host-side (their
shapes differ, so one program per stage is the natural compilation unit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from dpm_solver_tpu.models.adm_unet import super_res_inputs
from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver import DPM_Solver
from dpm_solver_tpu.wrapper import model_wrapper


@dataclasses.dataclass
class CascadeStage:
    """One stage of the cascade.

    `model(x, t, cond, low_res)` -> eps; `low_res` is None for the base
    stage, else the previous stage's (noise-augmented) output which the model
    itself conditions on (SuperResModel concatenates it: `super_res_inputs`).
    `aug_level`: noise-augmentation ratio applied to the low-res conditioning
    (IF-style; 0 disables). SDE algorithm types need `rng`.
    """

    model: Callable
    noise_schedule: NoiseScheduleVP
    resolution: int
    channels: int = 3
    steps: int = 25
    order: int = 2
    method: str = "multistep"
    skip_type: str = "time_uniform"
    algorithm_type: str = "dpmsolver++"
    guidance_scale: float = 1.0
    aug_level: float = 0.0
    t_end: Optional[float] = None


class CascadePipeline:
    """Base stage + upsampler stages; `sample(cond, uncond, rng, batch)`."""

    def __init__(self, stages: Sequence[CascadeStage]):
        assert stages, "need at least one stage"
        self.stages = list(stages)

    def _run_stage(self, stage: CascadeStage, cond, uncond, rng, batch,
                   low_res=None):
        ns = stage.noise_schedule
        rng_T, rng_aug, rng_sde = jax.random.split(rng, 3)

        if low_res is not None and stage.aug_level > 0:
            # IF-style noise augmentation of the conditioning image
            t_aug = jnp.asarray([stage.aug_level * ns.T])
            low_res = DPM_Solver(None, ns).add_noise(low_res, t_aug,
                                                     rng=rng_aug)

        def raw(x, t, c):
            # SuperResModel contract (unet.py:666-680): the MODEL concatenates
            # the low-res conditioning itself (e.g. via super_res_inputs);
            # the pipeline hands over raw x + low_res exactly once
            return stage.model(x, t, c, low_res)

        if uncond is not None:
            model_fn = model_wrapper(
                raw, ns, model_type="noise", guidance_type="classifier-free",
                condition=cond, unconditional_condition=uncond,
                guidance_scale=stage.guidance_scale)
        else:
            model_fn = model_wrapper(lambda x, t: raw(x, t, cond), ns,
                                     model_type="noise")

        solver = DPM_Solver(model_fn, ns,
                            algorithm_type=stage.algorithm_type)
        x_T = jax.random.normal(
            rng_T, (batch, stage.resolution, stage.resolution,
                    stage.channels))
        needs_rng = stage.algorithm_type.startswith("sde")
        return solver.sample(
            x_T, steps=stage.steps, t_end=stage.t_end or 1e-3,
            order=stage.order, skip_type=stage.skip_type,
            method=stage.method, rng=rng_sde if needs_rng else None)

    def sample(self, cond=None, uncond=None, *, rng, batch: int = 1,
               return_all_stages: bool = False):
        outs = []
        x = None
        for i, stage in enumerate(self.stages):
            rng, stage_rng = jax.random.split(rng)
            x = self._run_stage(stage, cond, uncond, stage_rng, batch,
                                low_res=x)
            outs.append(x)
        return outs if return_all_stages else x
