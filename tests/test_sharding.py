"""Multi-chip semantics on the virtual 8-device CPU mesh: sharded sampling
and training must exactly reproduce single-device results (data-parallel
sampling has zero cross-chip math, so equality is bitwise-level tight)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpm_solver_tpu import NoiseScheduleVP, build_sampler, model_wrapper
from dpm_solver_tpu.models import DDPMUNet, DDPMUNetConfig
from dpm_solver_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_sharded_sampler,
    sample_noise,
)
from dpm_solver_tpu.training import make_train_state, make_train_step
from dpm_solver_tpu.training.train import make_optimizer


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = DDPMUNetConfig.tiny(resolution=16)
    model = DDPMUNet(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    betas = np.linspace(1e-4, 0.02, 1000)
    ns = NoiseScheduleVP.discrete(betas=betas)
    return cfg, model, params, ns


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_sampler_matches_single_device(tiny_setup):
    cfg, model, params, ns = tiny_setup
    model_fn = model_wrapper(lambda x, t: model.apply(params, x, t), ns)
    fn = build_sampler(model_fn, ns, steps=6, order=2, method="multistep",
                       use_pallas=False)
    x_T = np.random.default_rng(0).standard_normal((8, 16, 16, 3)).astype(np.float32)

    single = np.asarray(jax.jit(fn)(jnp.asarray(x_T)))

    mesh = make_mesh(jax.devices()[:8])
    sampler = make_sharded_sampler(fn, mesh)
    sharded = np.asarray(sampler(jnp.asarray(x_T)))
    # per-sample math is identical; residual is fp32 reduction-order noise in
    # differently-compiled conv kernels, amplified by the random-weight UNet's
    # ~70x trajectory growth -> compare at signal scale
    scale = max(1.0, np.abs(single).max())
    np.testing.assert_allclose(sharded / scale, single / scale, rtol=0, atol=1e-4)


def test_partitionable_noise_is_sharding_invariant():
    mesh = make_mesh(jax.devices()[:8])
    sh = batch_sharding(mesh)
    key = jax.random.key(42)
    a = np.asarray(sample_noise(key, (16, 4, 4, 3)))
    b = np.asarray(sample_noise(key, (16, 4, 4, 3), sharding=sh))
    np.testing.assert_array_equal(a, b)


def test_sharded_train_step_matches_single_device(tiny_setup):
    import optax

    cfg, model, params, ns = tiny_setup
    # SGD for the equality check: Adam's 1/sqrt(v) rescaling amplifies fp32
    # reduction-order noise on near-zero-gradient coords to O(lr), which would
    # test the optimizer's conditioning, not the sharding.
    tx = optax.sgd(0.1)
    state, _ = make_train_state(params, tx=tx)
    step = make_train_step(model.apply, ns, tx)

    x0 = np.random.default_rng(1).standard_normal((8, 16, 16, 3)).astype(np.float32)
    rng = jax.random.key(7)

    s1, m1 = jax.jit(step)(state, jnp.asarray(x0), rng)

    mesh = make_mesh(jax.devices()[:8])
    data = batch_sharding(mesh)
    xs = jax.device_put(jnp.asarray(x0), data)
    sharded_step = jax.jit(step)
    s2, m2 = sharded_step(state, xs, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-4)
    assert int(s2.step) == 1
    assert np.isfinite(float(m2["loss"]))


def test_adaptive_solver_under_sharding(tiny_setup):
    cfg, model, params, ns = tiny_setup
    from dpm_solver_tpu.solver import adaptive_sample

    model_fn = model_wrapper(lambda x, t: model.apply(params, x, t), ns)
    x_T = np.random.default_rng(3).standard_normal((8, 16, 16, 3)).astype(np.float32)
    mesh = make_mesh(jax.devices()[:8])
    xs = jax.device_put(jnp.asarray(x_T), batch_sharding(mesh))
    x0, nfe = adaptive_sample(model_fn, ns, xs, order=2, atol=0.1, rtol=0.1)
    assert x0.shape == x_T.shape
    assert int(nfe) > 0
    assert np.all(np.isfinite(np.asarray(x0)))


def test_dpm_solver_sample_mesh_kwarg(tiny_setup):
    """DPM_Solver.sample(mesh=...) == single-device sample: the class API
    routes through make_sharded_sampler (replaces the reference's
    mp.spawn/DDP sampling launcher, main.py + runners/diffusion.py)."""
    from dpm_solver_tpu import DPM_Solver

    cfg, model, params, ns = tiny_setup
    model_fn = model_wrapper(lambda x, t: model.apply(params, x, t), ns)
    x_T = np.random.default_rng(3).standard_normal((8, 16, 16, 3)).astype(
        np.float32)

    single = np.asarray(
        DPM_Solver(model_fn, ns).sample(jnp.asarray(x_T), steps=6, order=2,
                                        method="multistep"))
    mesh = make_mesh(jax.devices()[:8])
    sharded = np.asarray(
        DPM_Solver(model_fn, ns).sample(jnp.asarray(x_T), steps=6, order=2,
                                        method="multistep", mesh=mesh))
    scale = max(1.0, np.abs(single).max())
    np.testing.assert_allclose(sharded / scale, single / scale,
                               rtol=0, atol=1e-4)

    with pytest.raises(ValueError, match="adaptive"):
        DPM_Solver(model_fn, ns).sample(jnp.asarray(x_T), method="adaptive",
                                        mesh=mesh)

    # mesh implies a pjit-compiled sampler: jit=False is an error, not a
    # silent ignore (ADVICE r4)
    with pytest.raises(ValueError, match="jit"):
        DPM_Solver(model_fn, ns).sample(jnp.asarray(x_T), steps=6, order=2,
                                        method="multistep", mesh=mesh,
                                        jit=False)

    # an SDE plan without an rng must raise on the mesh path too, instead
    # of silently sampling with make_sharded_sampler's PRNGKey(0) default
    # (ADVICE r4)
    with pytest.raises(ValueError, match="rng"):
        DPM_Solver(model_fn, ns, algorithm_type="sde-dpmsolver++").sample(
            jnp.asarray(x_T), steps=6, order=2, method="multistep",
            mesh=mesh)
