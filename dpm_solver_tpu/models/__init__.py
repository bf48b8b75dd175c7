from dpm_solver_tpu.models.ddpm_unet import DDPMUNet, DDPMUNetConfig

__all__ = ["DDPMUNet", "DDPMUNetConfig"]
