from dpm_solver_tpu.training.latent import make_latent_train_step, vae_encode_fn
from dpm_solver_tpu.training.train import (
    TrainState,
    ema_update,
    make_train_state,
    make_train_step,
)

__all__ = ["TrainState", "ema_update", "make_latent_train_step",
           "make_train_state", "make_train_step", "vae_encode_fn"]
