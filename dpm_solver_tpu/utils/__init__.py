from dpm_solver_tpu.utils.trees import bcast_right

__all__ = ["bcast_right"]
