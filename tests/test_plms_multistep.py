"""PLMS sampler, fused multi-step training, multi-host utility tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu import NoiseScheduleVP
from dpm_solver_tpu.parallel.multihost import (
    allgather_metrics,
    barrier,
    host_fold,
    host_subset,
)
from dpm_solver_tpu.samplers import ddim_sampler, plms_sampler
from dpm_solver_tpu.training.train import (
    make_multi_step,
    make_optimizer,
    make_train_state,
    make_train_step,
)


def _ns():
    return NoiseScheduleVP.discrete(betas=np.linspace(1e-4, 0.02, 1000))


def test_plms_equals_ddim_for_x_independent_eps():
    """If eps is constant in x and t, every AB combination of history equals
    eps, so PLMS must match DDIM exactly on the same grid."""
    ns = _ns()
    const = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 1), jnp.float32)
    model_fn = lambda x, t: jnp.broadcast_to(const, x.shape)
    x_T = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 1), jnp.float32)
    a = plms_sampler(model_fn, ns, steps=10)(x_T)
    b = ddim_sampler(model_fn, ns, steps=10)(x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-4)


def test_plms_beats_ddim_at_low_nfe():
    """On a smooth x-dependent model, multistep extrapolation should land
    closer to the fine-grid solution than DDIM at the same step count."""
    ns = _ns()
    model_fn = lambda x, t: 0.3 * x  # smooth, x-dependent eps
    x_T = jnp.asarray(np.random.RandomState(2).randn(2, 4, 4, 1), jnp.float32)
    truth = np.asarray(ddim_sampler(model_fn, ns, steps=500)(x_T))
    err_plms = np.abs(np.asarray(plms_sampler(model_fn, ns, steps=10)(x_T))
                      - truth).max()
    err_ddim = np.abs(np.asarray(ddim_sampler(model_fn, ns, steps=10)(x_T))
                      - truth).max()
    assert err_plms < err_ddim, (err_plms, err_ddim)


def test_multi_step_matches_sequential():
    ns = _ns()
    apply_fn = lambda p, x, t: x * p["w"]
    params = {"w": jnp.asarray(0.5)}
    tx = make_optimizer(1e-3, 0)
    state, _ = make_train_state(params, tx=tx)
    step = make_train_step(apply_fn, ns, tx)

    batches = jnp.asarray(
        np.random.RandomState(0).randn(3, 8, 4, 4, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)

    s_seq = state
    losses = []
    for i in range(3):
        s_seq, m = step(s_seq, batches[i], rng)
        losses.append(float(m["loss"]))

    multi = jax.jit(make_multi_step(step, 3))
    s_multi, metrics = multi(state, batches, rng)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses, rtol=1e-6)
    np.testing.assert_allclose(float(s_multi.params["w"]),
                               float(s_seq.params["w"]), rtol=1e-6)
    assert int(s_multi.step) == 3


def test_multihost_utils_single_host():
    rng = jax.random.PRNGKey(0)
    assert np.array_equal(jax.random.key_data(host_fold(rng, host_id=0)),
                          jax.random.key_data(jax.random.fold_in(rng, 0)))
    out = allgather_metrics({"a": jnp.asarray(3.0)})
    assert out["a"].shape == (1,) and out["a"][0] == 3.0
    barrier("test")  # no-op on one host
    assert host_subset(list(range(10)), host_id=1, n_hosts=4) == [1, 5, 9]
