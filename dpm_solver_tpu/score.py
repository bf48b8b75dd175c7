"""Score/noise model plumbing: label conventions per SDE family.

Rebuild of score_sde's model utilities (score_sde_jax/models/utils.py:164-254):
converts a raw network `model_fn(x, labels) -> out` into the continuous-time
score function or noise-prediction function each sampler consumes, handling
the per-family time-label conventions:

  VP/subVP continuous : labels = t * 999          out = eps  -> score = -eps/std
  VP discrete         : labels = t * (N-1)        out = eps  -> score = -eps/sqrt(1-abar)
  VE continuous       : labels = sigma(t)         out = score
  VE discrete         : labels = round((T-t)(N-1)) out = score
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from dpm_solver_tpu.sde import SubVPSDE, VESDE, VPSDE, batch_mul


def get_score_fn(sde, model_fn: Callable, continuous: bool = True) -> Callable:
    """Returns score(x, t) with t in [0, T]."""
    if isinstance(sde, (VPSDE, SubVPSDE)):
        if continuous or isinstance(sde, SubVPSDE):
            def score_fn(x, t):
                labels = t * 999.0
                eps = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
                return batch_mul(-1.0 / std, eps)
        else:
            sqrt_1m_abar = np.sqrt(1.0 - np.cumprod(1.0 - sde._betas()))

            def score_fn(x, t):
                labels = (t * (sde.N - 1)).astype(jnp.int32)
                eps = model_fn(x, labels.astype(jnp.float32))
                std = jnp.asarray(sqrt_1m_abar, x.dtype)[labels]
                return batch_mul(-1.0 / std, eps)
        return score_fn
    elif isinstance(sde, VESDE):
        if continuous:
            def score_fn(x, t):
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
                return model_fn(x, labels)
        else:
            def score_fn(x, t):
                labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.float32)
                return model_fn(x, labels)
        return score_fn
    raise NotImplementedError(f"no score convention for {type(sde).__name__}")


def get_noise_fn(sde, model_fn: Callable, continuous: bool = True) -> Callable:
    """Returns eps_hat(x, t): the noise-prediction view (DPM-Solver input).

    (ref: models/utils.py get_noise_fn; used at sampling.py:571)
    """
    if not isinstance(sde, (VPSDE, SubVPSDE)):
        # generic route: eps = -std * score
        score_fn = get_score_fn(sde, model_fn, continuous)

        def noise_fn(x, t):
            std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            return batch_mul(-std, score_fn(x, t))

        return noise_fn
    if continuous:
        def noise_fn(x, t):
            return model_fn(x, t * 999.0)
    else:
        def noise_fn(x, t):
            return model_fn(x, t * (sde.N - 1))
    return noise_fn
