"""Config system: a typed dataclass tree + named registry.

Replaces the reference's three config idioms (SURVEY.md §5: argparse+YAML in
ddpm_and_guided-diffusion/main.py:19-240, ml_collections in
score_sde_jax/configs/**, OmegaConf in stable-diffusion) with one:
frozen dataclasses (hashable, jit-static-friendly, typo-proof) and a
`get_config(name)` registry carrying the canonical benchmark entries from
the reference sample.sh files.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """DPM-Solver knobs (ref main.py flags + score_sde config.sampling)."""

    algorithm_type: str = "dpmsolver++"
    method: str = "multistep"
    order: int = 3
    steps: int = 10
    skip_type: str = "logSNR"
    lower_order_final: bool = True
    denoise_to_zero: bool = False
    thresholding: bool = False
    t_start: Optional[float] = None
    t_end: Optional[float] = None
    atol: float = 0.0078
    rtol: float = 0.05
    guidance_scale: float = 1.0
    classifier_scale: float = 0.0


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Discrete forward-process table (ref runners/diffusion.py:81-117 and
    the configs' `diffusion:` block). `betas()` reproduces the reference's
    `get_beta_schedule` exactly, including the iDDPM cosine alpha-bar
    discretization with max_beta=0.999 (:62-79)."""

    beta_schedule: str = "linear"
    beta_start: Optional[float] = 1e-4
    beta_end: Optional[float] = 0.02
    num_diffusion_timesteps: int = 1000

    def betas(self):
        import numpy as np

        n = self.num_diffusion_timesteps
        kind = self.beta_schedule
        if kind == "linear":
            return np.linspace(self.beta_start, self.beta_end, n,
                               dtype=np.float64)
        if kind == "quad":
            return np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                               n, dtype=np.float64) ** 2
        if kind == "cosine":
            def alpha_bar(t):
                return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

            i = np.arange(n, dtype=np.float64)
            return np.minimum(1.0 - alpha_bar((i + 1) / n) / alpha_bar(i / n),
                              0.999)
        if kind == "const":
            return self.beta_end * np.ones(n, dtype=np.float64)
        if kind == "jsd":
            return 1.0 / np.linspace(n, 1, n, dtype=np.float64)
        if kind == "sigmoid":
            x = np.linspace(-6, 6, n)
            return (1 / (np.exp(-x) + 1)) * (self.beta_end - self.beta_start) \
                + self.beta_start
        raise NotImplementedError(kind)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "cifar10"
    image_size: int = 32
    channels: int = 3
    centered: bool = True
    uniform_dequantization: bool = False
    random_flip: bool = True
    path: Optional[str] = None  # local data root (zero-egress image)


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    batch_size: int = 128
    n_iters: int = 950_001
    lr: float = 2e-4
    warmup: int = 5000
    grad_clip: float = 1.0
    ema_rate: float = 0.9999
    n_jitted_steps: int = 1
    snapshot_freq: int = 50_000
    snapshot_freq_for_preemption: int = 10_000
    log_freq: int = 50
    eval_freq: int = 100
    sde: str = "vpsde"  # vpsde | subvpsde | vesde
    continuous: bool = True
    reduce_mean: bool = True
    likelihood_weighting: bool = False


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 1000
    num_samples: int = 50_000
    begin_ckpt: int = 1
    end_ckpt: int = 26
    enable_sampling: bool = True
    enable_bpd: bool = False
    enable_loss: bool = True
    fid_stats_path: Optional[str] = None
    inception_ckpt_path: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class Config:
    name: str
    model_family: str  # ddpm_unet | ncsnpp | adm | sd
    model_config: object
    classifier_config: object = None
    diffusion: DiffusionConfig = DiffusionConfig()
    data: DataConfig = DataConfig()
    sampling: SamplingConfig = SamplingConfig()
    training: TrainingConfig = TrainingConfig()
    eval: EvalConfig = EvalConfig()
    ckpt_path: Optional[str] = None
    classifier_ckpt_path: Optional[str] = None
    workdir: str = "./workdir"
    seed: int = 42


_REGISTRY: Dict[str, Callable[[], Config]] = {}


def register_config(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_config(name: str, **overrides) -> Config:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; have {sorted(_REGISTRY)}")
    cfg = _REGISTRY[name]()
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def list_configs():
    return sorted(_REGISTRY)


# --------------------------------------------------------------------------- #
# canonical benchmark entries (ref sample.sh files; SURVEY.md §6)
# --------------------------------------------------------------------------- #


@register_config("cifar10_ddpm")
def _cifar10_ddpm() -> Config:
    """CIFAR-10 DDPM ckpt: dpmsolver++ multistep order-3, 10 NFE, logSNR
    (ddpm_and_guided-diffusion/sample.sh:6-17)."""
    from dpm_solver_tpu.models import DDPMUNetConfig

    return Config(
        name="cifar10_ddpm", model_family="ddpm_unet",
        model_config=DDPMUNetConfig.cifar10(),
        data=DataConfig(dataset="cifar10", image_size=32, centered=True),
        sampling=SamplingConfig(order=3, steps=10, skip_type="logSNR",
                                method="multistep"),
        eval=EvalConfig(batch_size=1000, num_samples=50_000),
    )


@register_config("imagenet64_iddpm")
def _imagenet64() -> Config:
    """ImageNet64 i-DDPM (cosine, learned sigma): same solver settings
    (sample.sh:19-30; configs/imagenet64.yml)."""
    from dpm_solver_tpu.models import ADMConfig

    return Config(
        name="imagenet64_iddpm", model_family="adm",
        model_config=ADMConfig.imagenet64_iddpm(),
        diffusion=DiffusionConfig(beta_schedule="cosine", beta_start=None,
                                  beta_end=None,
                                  num_diffusion_timesteps=4000),
        data=DataConfig(dataset="imagenet64", image_size=64),
        sampling=SamplingConfig(order=3, steps=10, skip_type="logSNR",
                                method="multistep"),
    )


@register_config("imagenet256_guided")
def _imagenet256() -> Config:
    """ImageNet256 ADM classifier-guided, scale 8: dpmsolver++ multistep
    order-2, 20 NFE, time_uniform + dynamic thresholding
    (sample.sh:32-50; configs/imagenet256_guided.yml)."""
    from dpm_solver_tpu.models import ADMConfig

    classifier = dataclasses.replace(
        ADMConfig.imagenet256_guided(), model_channels=128,
        num_res_blocks=2, out_channels=1000, pool="attention",
        num_classes=None, resblock_updown=True, use_scale_shift_norm=True)
    return Config(
        name="imagenet256_guided", model_family="adm",
        model_config=ADMConfig.imagenet256_guided(),
        classifier_config=classifier,
        data=DataConfig(dataset="imagenet", image_size=256),
        sampling=SamplingConfig(order=2, steps=20, skip_type="time_uniform",
                                method="multistep", thresholding=True,
                                classifier_scale=8.0),
        eval=EvalConfig(batch_size=50, num_samples=10_000),
    )


@register_config("celeba64_ddpm")
def _celeba64() -> Config:
    """CelebA 64x64 DDPM ckpt (configs/celeba.yml): same solver settings as
    the CIFAR-10 entry."""
    from dpm_solver_tpu.models import DDPMUNetConfig

    return Config(
        name="celeba64_ddpm", model_family="ddpm_unet",
        model_config=DDPMUNetConfig.celeba(),
        data=DataConfig(dataset="celeba", image_size=64, centered=True),
        sampling=SamplingConfig(order=3, steps=10, skip_type="logSNR",
                                method="multistep"),
        eval=EvalConfig(batch_size=500, num_samples=50_000),
    )


@register_config("imagenet128_guided")
def _imagenet128() -> Config:
    """ImageNet128 ADM classifier-guided, scale 1.25
    (configs/imagenet128_guided.yml)."""
    from dpm_solver_tpu.models import ADMConfig

    classifier = dataclasses.replace(
        ADMConfig.imagenet128_guided(), model_channels=128,
        out_channels=1000, pool="attention", num_classes=None,
        num_head_channels=64)
    return Config(
        name="imagenet128_guided", model_family="adm",
        model_config=ADMConfig.imagenet128_guided(),
        classifier_config=classifier,
        data=DataConfig(dataset="imagenet", image_size=128),
        sampling=SamplingConfig(order=2, steps=20, skip_type="time_uniform",
                                method="multistep", classifier_scale=1.25),
        eval=EvalConfig(batch_size=200, num_samples=50_000),
    )


@register_config("imagenet512_guided")
def _imagenet512() -> Config:
    """ImageNet512 ADM classifier-guided, scale 4.0
    (configs/imagenet512_guided.yml; fractional first channel mult)."""
    from dpm_solver_tpu.models import ADMConfig

    classifier = dataclasses.replace(
        ADMConfig.imagenet512_guided(), model_channels=128,
        out_channels=1000, pool="attention", num_classes=None)
    return Config(
        name="imagenet512_guided", model_family="adm",
        model_config=ADMConfig.imagenet512_guided(),
        classifier_config=classifier,
        data=DataConfig(dataset="imagenet", image_size=512),
        sampling=SamplingConfig(order=2, steps=20, skip_type="time_uniform",
                                method="multistep", thresholding=True,
                                classifier_scale=4.0),
        eval=EvalConfig(batch_size=20, num_samples=10_000),
    )


@register_config("lsun_bedroom")
def _lsun_bedroom() -> Config:
    """LSUN bedroom 256 unconditional ADM (configs/bedroom_guided.yml,
    cond_class: false / classifier_scale 0)."""
    from dpm_solver_tpu.models import ADMConfig

    return Config(
        name="lsun_bedroom", model_family="adm",
        model_config=ADMConfig.lsun_bedroom_guided(),
        data=DataConfig(dataset="lsun_bedroom", image_size=256),
        sampling=SamplingConfig(order=2, steps=20, skip_type="time_uniform",
                                method="multistep"),
        eval=EvalConfig(batch_size=50, num_samples=50_000),
    )


@register_config("score_sde_cifar10_vp_deep")
def _score_sde_vp() -> Config:
    """score_sde ddpmpp_deep cont. VP ckpt_8: singlestep order-3, 10 NFE,
    logSNR, eps 1e-3, batch 1000 (score_sde_jax/sample.sh:1-10)."""
    from dpm_solver_tpu.models import NCSNppConfig

    return Config(
        name="score_sde_cifar10_vp_deep", model_family="ncsnpp",
        model_config=NCSNppConfig.cifar10_ddpmpp(deep=True),
        data=DataConfig(dataset="cifar10", image_size=32, centered=True),
        sampling=SamplingConfig(order=3, steps=10, skip_type="logSNR",
                                method="singlestep", t_end=1e-3),
        training=TrainingConfig(sde="vpsde", continuous=True),
        eval=EvalConfig(batch_size=1000, num_samples=50_000),
    )


@register_config("tiny_test")
def _tiny_test() -> Config:
    """Small DDPM UNet at 16px: smoke tests, docs examples, CI."""
    from dpm_solver_tpu.models import DDPMUNetConfig

    return Config(
        name="tiny_test", model_family="ddpm_unet",
        model_config=DDPMUNetConfig.tiny(resolution=16),
        data=DataConfig(dataset="arrays", image_size=16, centered=True),
        sampling=SamplingConfig(order=2, steps=6, skip_type="time_uniform",
                                method="multistep"),
        training=TrainingConfig(batch_size=8, n_iters=10, warmup=2,
                                snapshot_freq=2,
                                snapshot_freq_for_preemption=2, log_freq=1),
        eval=EvalConfig(batch_size=4, num_samples=4, begin_ckpt=1,
                        end_ckpt=100),
    )


@register_config("tiny_superres")
def _tiny_superres() -> Config:
    """Small SuperRes ADM UNet (low-res concat conditioning) at 16px:
    exercises the runner's base_samples upsampling flow
    (ref runners/diffusion.py:420-446, unet.py:666-680)."""
    from dpm_solver_tpu.models import ADMConfig

    return Config(
        name="tiny_superres", model_family="adm",
        model_config=ADMConfig(
            image_size=16, in_channels=6, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(4,),
            channel_mult=(1, 2), num_heads=2),
        data=DataConfig(dataset="arrays", image_size=16, centered=True),
        sampling=SamplingConfig(order=2, steps=6, skip_type="time_uniform",
                                method="multistep"),
        eval=EvalConfig(batch_size=4, num_samples=4),
    )


@register_config("sd_v1")
def _sd_v1() -> Config:
    """Stable Diffusion v1: CFG 7.5, 25 steps, multistep order-2
    (stable-diffusion/README.md:22-25, txt2img.py defaults)."""
    from dpm_solver_tpu.models import ADMConfig

    return Config(
        name="sd_v1", model_family="sd",
        model_config=ADMConfig.sd_v1(),
        data=DataConfig(dataset="laion", image_size=512, channels=3),
        sampling=SamplingConfig(order=2, steps=25, skip_type="time_uniform",
                                method="multistep", guidance_scale=7.5),
    )
