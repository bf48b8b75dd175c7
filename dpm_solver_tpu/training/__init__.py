from dpm_solver_tpu.training.train import (
    TrainState,
    ema_update,
    make_train_state,
    make_train_step,
)

__all__ = ["TrainState", "ema_update", "make_train_state", "make_train_step"]
