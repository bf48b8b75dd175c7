"""DiffEdit: mask-guided image editing on the SD pipeline.

Behavioral twin of the reference notebook
(examples/stable-diffusion/scripts/diffedit_inpaint.ipynb):
  * cell 4 `get_mask`: noise the source latent, eps-predict under the source
    vs target prompts, and binarize the normalized |difference| map,
  * cell 6 `diffedit`: encode the latent to `encode_ratio` (stochastically or
    by the deterministic DPM-Solver inverse ODE), then sample back under the
    target prompt while re-imposing the unedited region each solver step via
    `correcting_xt_fn`.

TPU-first deltas: the per-step blend targets are precomputed host-side into
one (steps+1, ...) table indexed with `jnp.take` — the notebook's Python-list
indexing can't live inside our scanned trajectory — so the whole edit
(CFG UNet x steps + blending) stays one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.pipelines.stable_diffusion import DPMSolverSampler, LatentDiffusion
from dpm_solver_tpu.solver.plan import get_time_steps


def compute_edit_mask(
    model: LatentDiffusion,
    sampler: DPMSolverSampler,
    init_latent,
    src_ctx,
    dst_ctx,
    rng,
    *,
    n_noised: int = 3,
    encode_ratio: float = 0.5,
    clamp_rate: float = 3.5,
):
    """Binary (H, W) mask of the region the prompts disagree on (cell 4).

    1 marks pixels to EDIT. `clamp_rate` trades mask sparsity: larger ->
    fewer pixels marked (map is clamped at mean*clamp_rate, scaled to [0,1],
    thresholded at 0.5)."""
    b = init_latent.shape[0]
    assert b == 1, "mask estimation expects a single image latent"
    lat = jnp.repeat(init_latent, n_noised, axis=0)
    rep = lambda c: jnp.repeat(c, n_noised, axis=0)

    noised = sampler.stochastic_encode(lat, encode_ratio, rng=rng)
    t_cont = sampler.ratio_to_time(encode_ratio)
    t_label = jnp.full((n_noised,),
                       sampler.time_continuous_to_discrete(t_cont))
    pre_src = model.apply_model(noised, t_label, rep(src_ctx))
    pre_dst = model.apply_model(noised, t_label, rep(dst_ctx))

    diff = jnp.abs(pre_src - pre_dst).mean(axis=(0, 3))  # (H, W)
    max_v = diff.mean() * clamp_rate
    mask = jnp.clip(diff, 0.0, max_v) / max_v
    return (mask > 0.5).astype(init_latent.dtype)


def diffedit(
    model: LatentDiffusion,
    init_image,
    src_prompt: str,
    dst_prompt: str,
    *,
    encode_ratio: float = 0.6,
    steps: int = 20,
    encode_type: str = "stochastic",  # stochastic | deterministic
    guidance_scale: float = 7.5,
    order: int = 2,
    n_noised: int = 3,
    clamp_rate: float = 3.5,
    rng=None,
    mask=None,
    return_mask: bool = False,
):
    """Edit `init_image` ([-1,1] NHWC, batch 1) from `src_prompt` to
    `dst_prompt` (notebook cell 6). Returns image(s) in [0,1]
    (+ the latent-space mask if `return_mask`)."""
    assert encode_type in ("stochastic", "deterministic")
    rng = jax.random.PRNGKey(42) if rng is None else rng
    rng_mask, rng_noise = jax.random.split(rng)

    sampler = DPMSolverSampler(model)
    uc = model.get_learned_conditioning([""])
    src = model.get_learned_conditioning([src_prompt])
    dst = model.get_learned_conditioning([dst_prompt])
    z0 = model.encode_first_stage(init_image)

    if mask is None:
        mask = compute_edit_mask(model, sampler, z0, src, dst, rng_mask,
                                 n_noised=n_noised, encode_ratio=0.5,
                                 clamp_rate=clamp_rate)
    mask4 = mask[None, :, :, None]

    # sampling grid times (t_enc -> t_0, decreasing); blend target per step
    ns = sampler.noise_schedule
    t_enc = sampler.ratio_to_time(encode_ratio)
    grid = get_time_steps(ns, "time_uniform", t_enc, 1.0 / ns.total_N, steps)

    if encode_type == "stochastic":
        # the notebook re-noises the original to the CURRENT step's level
        # each correction (fresh noise per level)
        tbl = []
        for k, t_k in enumerate(grid):
            tbl.append(sampler.stochastic_encode(
                z0, sampler.time_to_ratio(float(t_k)),
                rng=jax.random.fold_in(rng_noise, k)))
        blend = jnp.stack(tbl)  # (steps+1, B, H, W, C)
        x_T = blend[0]
    else:
        z_enc, inter = sampler.encode(
            steps, z0, encode_ratio, conditioning=src,
            unconditional_guidance_scale=guidance_scale,
            unconditional_conditioning=uc, order=order,
            lower_order_final=False, return_intermediate=True)
        # encode grid (t_0 -> t_enc) is the reverse of the sampling grid
        full = list(inter) if len(inter) == steps + 1 else [z0] + list(inter)
        assert len(full) == steps + 1, len(full)
        blend = jnp.stack(full[::-1])
        x_T = z_enc

    def correcting_xt_fn(x, t, step):
        ref = jnp.take(blend, step, axis=0)
        return x * mask4 + (1.0 - mask4) * ref

    latents, _ = sampler.sample(
        steps, x_T.shape[0], x_T.shape[1:], dst,
        unconditional_guidance_scale=guidance_scale,
        unconditional_conditioning=uc, x_T=x_T, t_start=t_enc,
        order=order, lower_order_final=False,
        correcting_xt_fn=correcting_xt_fn)

    img = model.decode_first_stage(latents)
    img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
    return (img, mask) if return_mask else img
