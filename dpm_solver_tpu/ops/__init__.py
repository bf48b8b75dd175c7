from dpm_solver_tpu.ops.fused_act import bias_act_xla, fused_bias_act
from dpm_solver_tpu.ops.fused_update import fused_solver_update
from dpm_solver_tpu.ops.resample import (
    conv_downsample_2d,
    downsample_2d,
    mean_downsample_2d,
    nearest_upsample_2d,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)

__all__ = [
    "bias_act_xla",
    "conv_downsample_2d",
    "downsample_2d",
    "fused_bias_act",
    "fused_solver_update",
    "mean_downsample_2d",
    "nearest_upsample_2d",
    "upfirdn2d",
    "upsample_2d",
    "upsample_conv_2d",
]
