from dpm_solver_tpu.solver.adaptive import adaptive_sample
from dpm_solver_tpu.solver.correctors import make_dynamic_thresholding
from dpm_solver_tpu.solver.plan import (
    PlanRows,
    SamplePlan,
    build_multistep_plan,
    build_singlestep_plan,
    get_orders_and_timesteps_for_singlestep_solver,
    get_time_steps,
)
from dpm_solver_tpu.solver.sample import (
    DPM_Solver,
    build_sampler,
    execute_plan,
    jit_hoisting_constants,
    make_plan,
)

__all__ = [
    "DPM_Solver",
    "PlanRows",
    "SamplePlan",
    "adaptive_sample",
    "build_multistep_plan",
    "build_sampler",
    "build_singlestep_plan",
    "execute_plan",
    "get_orders_and_timesteps_for_singlestep_solver",
    "get_time_steps",
    "jit_hoisting_constants",
    "make_dynamic_thresholding",
    "make_plan",
]
