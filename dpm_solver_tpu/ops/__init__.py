from dpm_solver_tpu.ops.fused_update import fused_solver_update

__all__ = ["fused_solver_update"]
