"""Stable-Diffusion sampling pipeline: latent DPM-Solver + VAE + CLIP glue.

TPU-native rebuild of the reference LDM integration:
  * `DPMSolverSampler` — drop-in twin of the adapter at
    examples/stable-diffusion/ldm/models/diffusion/dpm_solver/sampler.py:8-162
    (sample / encode / stochastic_encode, time<->ratio converters), built on
    our schedule/wrapper/solver instead of the vendored torch file.
  * `LatentDiffusion` — the minimal model bundle the adapter needs
    (apply_model + first-stage encode/decode + conditioning), standing in for
    the reference's 1445-line PL module (ldm/models/diffusion/ddpm.py) whose
    training scaffolding is out of sampling-parity scope.
  * `StableDiffusionPipeline` — txt2img / img2img front end mirroring
    scripts/txt2img.py:97-345 (CFG at scale 7.5, PNG-ready [0,1] output).

Everything after text encoding compiles to one XLA program per (shape,
steps) configuration: CFG pair folded into the batch, the full solver
trajectory under lax.scan, then the VAE decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.models.adm_unet import ADMConfig, ADMUNet
from dpm_solver_tpu.models.vae import AutoencoderKL, VAEConfig, convert_autoencoder_kl
from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver import DPM_Solver
from dpm_solver_tpu.utils.convert import convert_adm_unet
from dpm_solver_tpu.wrapper import model_wrapper


def make_ldm_betas(n_timestep: int = 1000, linear_start: float = 0.00085,
                   linear_end: float = 0.0120) -> np.ndarray:
    """LDM's 'linear' beta schedule is sqrt-space linear
    (ldm/modules/diffusionmodules/util.py make_beta_schedule)."""
    return np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                       dtype=np.float64) ** 2


@dataclasses.dataclass
class LatentDiffusion:
    """Minimal LDM bundle: eps-UNet over latents + KL first stage + text glue.

    `text_encode(prompts) -> (B, T, context_dim)` is injected (FrozenCLIPEmbedder
    or any callable). `scale_factor` follows v1-inference.yaml (0.18215).
    """

    unet: ADMUNet
    unet_params: Any
    vae: Any  # AutoencoderKL or VQModel (first-stage dispatch via _is_vq)
    vae_params: Any
    text_encode: Optional[Callable] = None
    betas: np.ndarray = dataclasses.field(default_factory=make_ldm_betas)
    scale_factor: float = 0.18215
    parameterization: str = "eps"  # eps | v (SD-2.1 is v-prediction)
    conditioning_key: str = "crossattn"  # crossattn|concat|hybrid|adm|none

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)

    def apply_model(self, x, t, cond):
        """Prediction on latents; t are discrete labels in [0, N).

        DiffusionWrapper twin (ddpm.py:1396-1416): `cond` is either a raw
        cross-attention context array (the txt2img fast path) or a dict
        with any of `c_concat` (channel-concatenated onto x — the SR /
        inpainting LDMs), `c_crossattn` (context), `c_adm` (class vector),
        each an array or list of arrays.
        """
        if cond is None:
            cond = {}
        elif not isinstance(cond, dict):
            cond = ({"c_concat": cond} if self.conditioning_key == "concat"
                    else {"c_crossattn": cond})

        def _as_list(v):
            return list(v) if isinstance(v, (list, tuple)) else [v]

        xc = x
        if cond.get("c_concat") is not None:
            xc = jnp.concatenate([x] + _as_list(cond["c_concat"]), axis=-1)
        context = None
        if cond.get("c_crossattn") is not None:
            ca = _as_list(cond["c_crossattn"])
            context = ca[0] if len(ca) == 1 else jnp.concatenate(ca, axis=1)
        y = cond.get("c_adm")
        return self.unet.apply(self.unet_params, xc, t, y, context,
                               deterministic=True)

    def get_learned_conditioning(self, prompts):
        if self.text_encode is None:
            raise ValueError("no text encoder attached")
        return self.text_encode(prompts)

    @property
    def _is_vq(self) -> bool:
        from dpm_solver_tpu.models.vae import VQModel

        return isinstance(self.vae, VQModel)

    def encode_first_stage(self, img, *, sample_rng=None):
        """image [-1,1] NHWC -> scaled latent (mode unless rng given). The
        VQ first stage yields the PRE-quant latent (VQModelInterface
        convention, autoencoder.py:14-34)."""
        if self._is_vq:
            from dpm_solver_tpu.models.vae import VQModel

            z = self.vae.apply(self.vae_params, img, method=VQModel.encode)
        else:
            posterior = self.vae.apply(self.vae_params, img,
                                       method=AutoencoderKL.encode)
            z = (posterior.mode() if sample_rng is None
                 else posterior.sample(sample_rng))
        return self.scale_factor * z

    def decode_first_stage(self, z):
        z = z / self.scale_factor
        if self._is_vq:
            from dpm_solver_tpu.models.vae import VQModel

            # VQModelInterface decode QUANTIZES by default (autoencoder.py)
            return self.vae.apply(self.vae_params, z, method=VQModel.decode)
        return self.vae.apply(self.vae_params, z, method=AutoencoderKL.decode)


class DPMSolverSampler:
    """Reference-compatible adapter (sampler.py:8-162): CFG multistep
    DPM-Solver++ over LDM latents, deterministic/stochastic encoding."""

    def __init__(self, model: LatentDiffusion):
        self.model = model
        self.noise_schedule = NoiseScheduleVP(
            "discrete", alphas_cumprod=model.alphas_cumprod)

    def _model_fn(self, conditioning, unconditional_conditioning, scale):
        model_type = {"eps": "noise", "v": "v"}[self.model.parameterization]
        return model_wrapper(
            lambda x, t, c: self.model.apply_model(x, t, c),
            self.noise_schedule,
            model_type=model_type,
            guidance_type="classifier-free",
            condition=conditioning,
            unconditional_condition=unconditional_conditioning,
            guidance_scale=scale,
        )

    def sample(self, S: int, batch_size: int, shape: Tuple[int, int, int],
               conditioning=None, *, unconditional_guidance_scale: float = 1.0,
               unconditional_conditioning=None, x_T=None, rng=None,
               skip_type: str = "time_uniform", method: str = "multistep",
               order: int = 2, lower_order_final: bool = True,
               correcting_xt_fn: Optional[Callable] = None,
               t_start=None, t_end=None, return_intermediate: bool = True,
               mesh=None):
        """shape is (H, W, C) latent shape (NHWC world). Returns
        (x, intermediates) like the reference.

        `mesh`: a `jax.sharding.Mesh` — the whole trajectory runs as one
        pjit program with the latent batch sharded over the mesh's data
        axis (weights/conditioning replicated; zero collectives)."""
        h, w, c = shape
        if x_T is None:
            if rng is None:
                raise ValueError("pass x_T or rng")
            x_T = jax.random.normal(rng, (batch_size, h, w, c))
        model_fn = self._model_fn(conditioning, unconditional_conditioning,
                                  unconditional_guidance_scale)
        if mesh is not None:
            from dpm_solver_tpu.parallel import make_sharded_sampler
            from dpm_solver_tpu.solver import build_sampler

            fn = build_sampler(
                model_fn, self.noise_schedule,
                algorithm_type="dpmsolver++",
                correcting_xt_fn=correcting_xt_fn,
                return_intermediate=return_intermediate,
                steps=S, t_start=t_start, t_end=t_end, order=order,
                skip_type=skip_type, method=method,
                lower_order_final=lower_order_final)
            out = make_sharded_sampler(fn, mesh)(x_T)
            return out if return_intermediate else (out, None)
        solver = DPM_Solver(model_fn, self.noise_schedule,
                            algorithm_type="dpmsolver++",
                            correcting_xt_fn=correcting_xt_fn)
        out = solver.sample(x_T, steps=S, t_start=t_start, t_end=t_end,
                            order=order, skip_type=skip_type, method=method,
                            lower_order_final=lower_order_final,
                            return_intermediate=return_intermediate)
        return out if return_intermediate else (out, None)

    def stochastic_encode(self, x0, encode_ratio: float, noise=None, rng=None):
        """q(x_t | x_0) forward noising to the given ratio (sampler.py:91-96)."""
        t_end = self.ratio_to_time(encode_ratio)
        solver = DPM_Solver(None, self.noise_schedule)
        return solver.add_noise(x0, jnp.asarray([t_end]), noise=noise, rng=rng)

    def encode(self, S: int, x, encode_ratio: float, conditioning=None, *,
               unconditional_guidance_scale: float = 1.0,
               unconditional_conditioning=None,
               skip_type: str = "time_uniform", method: str = "multistep",
               order: int = 2, lower_order_final: bool = False,
               return_intermediate: bool = True):
        """Deterministic ODE encoding x_0 -> x_t (sampler.py:98-138)."""
        model_fn = self._model_fn(conditioning, unconditional_conditioning,
                                  unconditional_guidance_scale)
        solver = DPM_Solver(model_fn, self.noise_schedule,
                            algorithm_type="dpmsolver++")
        t_end = self.ratio_to_time(encode_ratio)
        out = solver.inverse(x, steps=S, t_end=t_end, skip_type=skip_type,
                             method=method, order=order,
                             lower_order_final=lower_order_final,
                             return_intermediate=return_intermediate)
        return out if return_intermediate else (out, None)

    # -- time <-> ratio converters (sampler.py:140-162) -----------------------

    def time_discrete_to_continuous(self, t_discrete):
        return (t_discrete + 1.0) / self.noise_schedule.total_N

    def time_continuous_to_discrete(self, t_continuous):
        return t_continuous * self.noise_schedule.total_N - 1.0

    def ratio_to_time(self, ratio):
        n = self.noise_schedule.total_N
        return (1.0 - 1.0 / n) * ratio + 1.0 / n

    def time_to_ratio(self, t_continuous):
        n = self.noise_schedule.total_N
        return (t_continuous - 1.0 / n) / (1.0 - 1.0 / n)


class StableDiffusionPipeline:
    """txt2img / img2img front end (ref scripts/txt2img.py:97-345,
    scripts/img2img.py). Latent shape = image / 8; CFG via one doubled batch."""

    def __init__(self, model: LatentDiffusion):
        self.model = model
        self.sampler = DPMSolverSampler(model)
        # spatial reduction of the first stage (8x for the SD VAE)
        self.vae_factor = 2 ** (len(model.vae.config.ch_mult) - 1)

    def txt2img(self, prompts, *, negative_prompt: str = "", steps: int = 25,
                guidance_scale: float = 7.5, height: int = 512,
                width: int = 512, rng=None, order: int = 2, mesh=None,
                method: str = "multistep"):
        """`mesh`: shard the prompt batch over a `jax.sharding.Mesh` data
        axis — the serving scale-out path (batch must divide the axis).
        `method`: any fixed-grid solver method incl. "unipc"."""
        if isinstance(prompts, str):
            prompts = [prompts]
        b = len(prompts)
        cond = self.model.get_learned_conditioning(prompts)
        uncond = self.model.get_learned_conditioning([negative_prompt] * b)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        f = self.vae_factor
        latents, _ = self.sampler.sample(
            steps, b, (height // f, width // f,
                       self.model.vae.config.z_channels), cond,
            unconditional_guidance_scale=guidance_scale,
            unconditional_conditioning=uncond, rng=rng, order=order,
            return_intermediate=False, mesh=mesh, method=method)
        img = self.model.decode_first_stage(latents)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    def img2img(self, init_image, prompts, *, strength: float = 0.75,
                negative_prompt: str = "", steps: int = 25,
                guidance_scale: float = 7.5, rng=None, order: int = 2):
        """init_image in [-1,1] NHWC; noise to `strength` ratio, then sample
        back down (ref scripts/img2img.py semantics)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        b = len(prompts)
        assert init_image.shape[0] == b
        cond = self.model.get_learned_conditioning(prompts)
        uncond = self.model.get_learned_conditioning([negative_prompt] * b)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        rng_n, rng_s = jax.random.split(rng)
        z0 = self.model.encode_first_stage(init_image)
        t_enc = self.sampler.ratio_to_time(strength)
        z_t = self.sampler.stochastic_encode(z0, strength, rng=rng_n)
        steps_eff = max(1, int(steps * strength))
        latents, _ = self.sampler.sample(
            steps_eff, b, z0.shape[1:], cond,
            unconditional_guidance_scale=guidance_scale,
            unconditional_conditioning=uncond, x_T=z_t, t_start=t_enc,
            order=min(order, steps_eff), return_intermediate=False)
        img = self.model.decode_first_stage(latents)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    def inpaint(self, init_image, mask, prompts, *, negative_prompt: str = "",
                steps: int = 25, guidance_scale: float = 7.5, rng=None,
                order: int = 2):
        """Text-guided inpainting by masked latent resampling.

        Repaint-style: at every solver step the KNOWN region (mask==0) is
        re-imposed from the init latent forward-noised to that step's level
        (the `correcting_xt_fn` hook, same machinery as DiffEdit), and the
        final image is composited in pixel space exactly as the reference
        does (scripts/inpaint.py:88-96:
        `inpainted = (1-mask)*image + mask*predicted`). Works with any
        txt2img checkpoint — no dedicated inpainting UNet needed.

        Args:
          init_image: [B,H,W,3] in [-1,1].
          mask: [B,H,W] or [B,H,W,1], 1 = region to REGENERATE, 0 = keep.
        """
        from dpm_solver_tpu.solver.plan import get_time_steps

        if isinstance(prompts, str):
            prompts = [prompts]
        b = len(prompts)
        assert init_image.shape[0] == b
        mask = jnp.asarray(mask, init_image.dtype)
        if mask.ndim == 3:
            mask = mask[..., None]
        cond = self.model.get_learned_conditioning(prompts)
        uncond = self.model.get_learned_conditioning([negative_prompt] * b)
        rng = jax.random.PRNGKey(0) if rng is None else rng

        z0 = self.model.encode_first_stage(init_image)
        f = self.vae_factor
        mask_latent = (jax.image.resize(
            mask, (b, mask.shape[1] // f, mask.shape[2] // f, 1),
            method="nearest") >= 0.5).astype(z0.dtype)

        # per-step blend targets on the SAME grid the sampler will use
        ns = self.sampler.noise_schedule
        grid = get_time_steps(ns, "time_uniform", float(ns.T),
                              1.0 / ns.total_N, steps)
        blend = jnp.stack([
            self.sampler.stochastic_encode(
                z0, self.sampler.time_to_ratio(float(t_k)),
                rng=jax.random.fold_in(rng, k))
            for k, t_k in enumerate(grid)
        ])

        def correcting_xt_fn(x, t, step):
            ref = jnp.take(blend, step, axis=0)
            return x * mask_latent + (1.0 - mask_latent) * ref

        latents, _ = self.sampler.sample(
            steps, b, z0.shape[1:], cond,
            unconditional_guidance_scale=guidance_scale,
            unconditional_conditioning=uncond, x_T=blend[0],
            order=order, correcting_xt_fn=correcting_xt_fn,
            return_intermediate=False)
        pred = jnp.clip((self.model.decode_first_stage(latents) + 1.0) / 2.0,
                        0.0, 1.0)
        orig = jnp.clip((init_image + 1.0) / 2.0, 0.0, 1.0)
        return (1.0 - mask) * orig + mask * pred

    def upscale(self, lr_image, *, steps: int = 50, rng=None,
                order: int = 2, cond_encode: Optional[Callable] = None,
                context=None):
        """Blind super-resolution with a concat-conditioned LDM (the bsr-sr
        models: conditioning_key 'concat', identity cond stage — the LR
        image is channel-concatenated onto z_t at every step; latent
        spatial size equals the LR size for the f=4 first stage, so output
        is LR * vae_factor).

        Args:
          lr_image: [B,h,w,3] in [-1,1] (e.g. from
            `data.superres_example`'s LR output).
          cond_encode: optional LR -> conditioning map for models whose
            cond stage is not the identity.
        """
        model = self.model
        assert model.conditioning_key in ("concat", "hybrid"), \
            "upscale needs a concat-conditioned LDM"
        if model.conditioning_key == "hybrid" and context is None:
            raise ValueError("hybrid-conditioned model: pass `context` "
                             "(cross-attention conditioning) to upscale")
        b, h, w = lr_image.shape[:3]
        c = lr_image if cond_encode is None else cond_encode(lr_image)
        cond = {"c_concat": c}
        if context is not None:
            cond["c_crossattn"] = context
        rng = jax.random.PRNGKey(0) if rng is None else rng
        latents, _ = self.sampler.sample(
            steps, b, (h, w, model.vae.config.z_channels),
            cond, unconditional_guidance_scale=1.0,
            rng=rng, order=order, return_intermediate=False)
        img = model.decode_first_stage(latents)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)


_LDM_PRESETS = {
    # name -> (unet_config, vae_config, betas kwargs, scale_factor)
    "sd_v1": (ADMConfig.sd_v1, VAEConfig.sd_v1,
              dict(linear_start=0.00085, linear_end=0.0120), 0.18215),
    "sd_v2_1": (ADMConfig.sd_v2_1, VAEConfig.sd_v1,
                dict(linear_start=0.00085, linear_end=0.0120), 0.18215),
    "cin256": (ADMConfig.cin256, VAEConfig.vq_cin256,
               dict(linear_start=0.0015, linear_end=0.0195), 1.0),
    "rdm_768": (ADMConfig.rdm_768, VAEConfig.rdm_768,
                dict(linear_start=0.0015, linear_end=0.015), 0.22765929),
}


def load_sd_checkpoint(path_or_state_dict, *,
                       preset: str = "sd_v1",
                       unet_config: Optional[ADMConfig] = None,
                       vae_config: Optional[VAEConfig] = None,
                       text_encode: Optional[Callable] = None,
                       parameterization: Optional[str] = None,
                       conditioning_key: Optional[str] = None,
                       quant: Optional[str] = None
                       ) -> LatentDiffusion:
    """Build a LatentDiffusion from a CompVis checkpoint: routes
    `model.diffusion_model.*` through convert_adm_unet and
    `first_stage_model.*` through the KL or VQ converter (auto-detected from
    the quantizer keys). `preset` selects model geometry + schedule + scale
    factor (sd_v1 | sd_v2_1 | cin256 | rdm_768 — the reference's LDM config
    files); explicit configs override the preset. Accepts a path or a
    pre-loaded state dict (incl. EMA-swapped dicts)."""
    if isinstance(path_or_state_dict, (str,)):
        from dpm_solver_tpu.utils.convert import load_torch_state_dict

        sd = load_torch_state_dict(path_or_state_dict)
    else:
        sd = {k: np.asarray(v) for k, v in path_or_state_dict.items()}

    if preset not in _LDM_PRESETS:
        raise ValueError(f"unknown preset {preset!r}; "
                         f"one of {sorted(_LDM_PRESETS)}")
    u_default, v_default, beta_kw, scale = _LDM_PRESETS[preset]
    unet_config = unet_config or u_default()
    vae_config = vae_config or v_default()
    if quant is not None:
        # int8 serving path (ops/quant.py): a config switch only — the
        # converted param tree is identical either way. Covers the UNet and
        # (under w8a8_conv) the VAE conv trunk.
        import dataclasses as _dc

        unet_config = _dc.replace(unet_config, quant=quant)
        vae_config = _dc.replace(vae_config, quant=quant)

    unet_sd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
               if k.startswith("model.diffusion_model.")}
    if not unet_sd:
        raise ValueError("no model.diffusion_model.* keys in checkpoint")
    unet_params = convert_adm_unet(unet_sd, unet_config)

    is_vq = any(k.endswith("quantize.embedding.weight") for k in sd)
    if is_vq:
        from dpm_solver_tpu.models.vae import VQModel, convert_vq_model

        n_embed = next(np.asarray(v).shape[0] for k, v in sd.items()
                       if k.endswith("quantize.embedding.weight"))
        vae = VQModel(config=vae_config, n_embed=int(n_embed))
        vae_params = convert_vq_model(sd, vae_config)
    else:
        vae = AutoencoderKL(config=vae_config)
        vae_params = convert_autoencoder_kl(sd, vae_config)

    if parameterization is None:
        # SD-2.x checkpoints (linear transformer projections) are v-prediction
        parameterization = ("v" if unet_config.use_linear_in_transformer
                            else "eps")
    if conditioning_key is None:
        # UNet eating more channels than the latent has => concat
        # conditioning (SR / inpainting LDMs; ddpm.py:442-443's
        # concat_mode); hybrid when it also cross-attends
        extra = unet_config.in_channels > vae_config.embed_dim
        has_ctx = unet_config.context_dim is not None
        conditioning_key = ("hybrid" if extra and has_ctx
                           else "concat" if extra
                           else "crossattn" if has_ctx else "none")
    return LatentDiffusion(
        unet=ADMUNet(config=unet_config), unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        betas=make_ldm_betas(1000, **beta_kw), scale_factor=scale,
        text_encode=text_encode, parameterization=parameterization,
        conditioning_key=conditioning_key)


def class_conditional_sample(model: LatentDiffusion, class_embedder, labels,
                             *, steps: int = 20, guidance_scale: float = 1.0,
                             uncond_label: Optional[int] = None,
                             latent_hw: Optional[Tuple[int, int]] = None,
                             rng=None, order: int = 2):
    """Class-conditional LDM sampling (ref scripts/sample_diffusion.py +
    the cin256 ClassEmbedder conditioning): labels -> embedded context ->
    CFG DPM-Solver++ -> first-stage decode. Works with either the KL or the
    VQ first stage (LatentDiffusion.decode_first_stage)."""
    import numpy as _np

    labels = jnp.asarray(labels, jnp.int32)
    b = labels.shape[0]
    sampler = DPMSolverSampler(model)
    cond = class_embedder(labels)
    uncond = None
    if guidance_scale != 1.0:
        if uncond_label is None:
            raise ValueError("CFG needs an uncond_label (the embedder's "
                             "'unconditional' class id)")
        uncond = class_embedder(jnp.full((b,), uncond_label, jnp.int32))
    f = 2 ** (len(model.vae.config.ch_mult) - 1)
    hw = latent_hw or (model.vae.config.resolution // f,
                       model.vae.config.resolution // f)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    latents, _ = sampler.sample(
        steps, b, (hw[0], hw[1], model.vae.config.z_channels), cond,
        unconditional_guidance_scale=guidance_scale,
        unconditional_conditioning=uncond, rng=rng, order=order,
        return_intermediate=False)
    img = model.decode_first_stage(latents)
    return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
