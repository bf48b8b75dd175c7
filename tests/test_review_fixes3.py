"""Regression tests for the third code-review pass.

Covers: cosine-schedule parity vs the reference JAX implementation
(T=0.9946, atan(beta_max*(1+s)/pi) t_max), ancestral DDPM's fixed-LARGE
variance (denoising.py:102), the PLMS next-time grid, PC-sampler NFE
accounting with 'none' stages, config-driven beta tables (imagenet64's
cosine/4000 iDDPM table), and the data pipeline's integer-vs-float
rescale decision.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference
from dpm_solver_tpu import NoiseScheduleVP
from dpm_solver_tpu.samplers import (
    ddpm_ancestral_sampler,
    get_pc_sampler,
    plms_sampler,
)
from dpm_solver_tpu.sde import VPSDE


@pytest.fixture(scope="module")
def reference_jax_module():
    path = pathlib.Path("/root/reference/dpm_solver_jax.py")
    if not path.exists():
        pytest.skip("reference JAX file not mounted")
    spec = importlib.util.spec_from_file_location("reference_dpm_solver_jax",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_cosine_schedule_matches_reference_jax(reference_jax_module):
    """T must be the reference's hard-set 0.9946 (not the raw t_max) and the
    marginals/inverse must agree (ref dpm_solver_jax.py:110-175)."""
    ref = reference_jax_module.NoiseScheduleVP("cosine")
    ours = NoiseScheduleVP.cosine()
    assert ours.T == pytest.approx(ref.T)  # 0.9946
    assert ours.total_N == ref.total_N == 1000
    t = jnp.linspace(1e-3, ours.T, 37)
    for name in ("marginal_log_mean_coeff", "marginal_alpha", "marginal_std",
                 "marginal_lambda"):
        a = np.asarray(getattr(ours, name)(t))
        b = np.asarray(getattr(ref, name)(t))
        # rtol floor set by the reference's fp32 log(1-exp(x)) round-off at
        # the high-SNR end (we use the stabler log1p/expm1 form)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-6, err_msg=name)
    lambs = ours.marginal_lambda(t)
    np.testing.assert_allclose(np.asarray(ours.inverse_lambda(lambs)),
                               np.asarray(ref.inverse_lambda(lambs)),
                               rtol=2e-5, atol=2e-6)


def test_ancestral_variance_is_fixed_large():
    """With an eps model that exactly cancels the x0 term, the state is pure
    accumulated noise and its variance follows a closed-form recursion. The
    reference adds noise with std sqrt(beta_t) (fixed-LARGE,
    denoising.py:102), NOT the posterior fixed-small std."""
    n, steps, batch = 12, 12, 120_000
    betas = np.linspace(0.02, 0.12, n)
    ns = NoiseScheduleVP.discrete(betas=betas)
    log_alpha = np.asarray(ns.marginal_log_mean_coeff_np(
        (np.arange(n, dtype=np.float64) + 1) / n))
    abar = np.exp(2.0 * log_alpha)
    abar_j = jnp.asarray(abar, jnp.float32)

    def eps_model(x, t):  # predicts x0 = 0 exactly -> no clipping nonlinearity
        at = abar_j[t.astype(jnp.int32)]
        return x / jnp.sqrt(1.0 - at)[:, None, None, None]

    sampler = ddpm_ancestral_sampler(eps_model, ns, steps=steps)
    out = np.asarray(jax.jit(sampler)(jnp.zeros((batch, 1, 1, 1)),
                                      jax.random.PRNGKey(0)))

    # closed-form variance for both variance conventions
    seq = np.linspace(0, n - 1, steps).astype(np.int64)
    at = abar[seq][::-1]
    atm1 = np.concatenate([[1.0], abar[seq]])[:-1][::-1]
    beta = 1.0 - at / atm1
    t_seq = seq[::-1]
    var_large = var_small = 0.0
    for i in range(steps):
        c = np.sqrt(1.0 - beta[i]) * (1.0 - atm1[i]) / (1.0 - at[i])
        mask = 1.0 if t_seq[i] > 0 else 0.0
        var_large = c**2 * var_large + mask * beta[i]
        var_small = c**2 * var_small + mask * beta[i] * (1 - atm1[i]) / (1 - at[i])
    emp = float(out.var())
    assert emp == pytest.approx(var_large, rel=0.05)
    assert abs(emp - var_small) > 0.25 * abs(var_large - var_small)


def test_plms_exact_on_analytic_eps():
    """For a delta data distribution the exact eps predictor makes every DDIM
    step exact and the AB history degenerate (constant eps), so PLMS must
    land on x0 exactly — including the first step's midpoint correction,
    which evaluates the model at t_next and therefore catches a wrong
    t_next grid."""
    n, steps = 1000, 8
    ns = NoiseScheduleVP.discrete(betas=np.linspace(1e-4, 0.02, n))
    log_alpha = np.asarray(ns.marginal_log_mean_coeff_np(
        (np.arange(n, dtype=np.float64) + 1) / n))
    abar_j = jnp.asarray(np.exp(2.0 * log_alpha), jnp.float32)
    x0_true = jnp.asarray(np.random.RandomState(0).randn(3, 4, 4, 2) * 0.3,
                          jnp.float32)

    def eps_model(x, t):
        at = abar_j[t.astype(jnp.int32)][:, None, None, None]
        return (x - jnp.sqrt(at) * x0_true) / jnp.sqrt(1.0 - at)

    e = jax.random.normal(jax.random.PRNGKey(1), x0_true.shape)
    at_T = abar_j[n - 1]
    x_T = jnp.sqrt(at_T) * x0_true + jnp.sqrt(1.0 - at_T) * e
    out = np.asarray(jax.jit(plms_sampler(eps_model, ns, steps=steps))(x_T))
    np.testing.assert_allclose(out, np.asarray(x0_true), atol=2e-4)


def test_pc_sampler_nfe_accounting():
    sde = VPSDE(N=7)
    score = lambda x, t: -x

    def run(**kw):
        _, nfe = get_pc_sampler(sde, score, **kw)(
            jnp.zeros((1, 2, 2, 1)), jax.random.PRNGKey(0))
        return int(nfe)

    assert run(predictor="euler_maruyama", corrector="none") == 7
    assert run(predictor="none", corrector="langevin",
               n_corrector_steps=2) == 14
    assert run(predictor="euler_maruyama", corrector="langevin",
               n_corrector_steps=2) == 21
    assert run(predictor="none", corrector="none") == 0


def test_config_diffusion_betas():
    """imagenet64 must use the iDDPM cosine alpha-bar table with 4000 steps
    (configs/imagenet64.yml), cifar10 the linear 1000 table."""
    from dpm_solver_tpu.configs import DiffusionConfig, get_config

    lin = get_config("cifar10_ddpm").diffusion.betas()
    np.testing.assert_allclose(lin, np.linspace(1e-4, 0.02, 1000))

    cos = get_config("imagenet64_iddpm").diffusion.betas()
    assert cos.shape == (4000,)

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    i = np.arange(4000, dtype=np.float64)
    expect = np.minimum(1 - alpha_bar((i + 1) / 4000) / alpha_bar(i / 4000),
                        0.999)
    np.testing.assert_allclose(cos, expect)
    assert cos.max() == 0.999  # the max_beta clamp engages near t=T

    quad = DiffusionConfig(beta_schedule="quad", beta_start=1e-4,
                           beta_end=0.02, num_diffusion_timesteps=10).betas()
    np.testing.assert_allclose(
        quad, np.linspace(1e-2, 0.02 ** 0.5, 10) ** 2)


def test_make_dataset_float_input_not_rescaled():
    """Float inputs already in [0,1] must NOT be divided by 255 (the old
    check compared dtype after casting to float32 — always false)."""
    from dpm_solver_tpu.data import make_dataset, numpy_iterator

    rs = np.random.RandomState(0)
    floats = rs.rand(16, 4, 4, 3).astype(np.float32)
    ds = make_dataset(floats, batch_size=8, num_local_devices=1,
                      random_flip=False, shuffle=False, repeat=False)
    batch = next(numpy_iterator(ds)).reshape(-1, 4, 4, 3)
    np.testing.assert_allclose(batch, floats[:8], rtol=1e-6)

    ints = (floats * 255).astype(np.uint8)
    ds = make_dataset(ints, batch_size=8, num_local_devices=1,
                      random_flip=False, shuffle=False, repeat=False)
    batch = next(numpy_iterator(ds)).reshape(-1, 4, 4, 3)
    assert batch.max() <= 1.0 and batch.dtype == np.float32


def test_tfrecord_dataset_roundtrip(tmp_path):
    """Write records in the reference FFHQ format ({'shape' int64[3] CHW,
    'data' raw uint8 bytes}, datasets.py:151-171) and read them back."""
    import tensorflow as tf

    from dpm_solver_tpu.data import tfrecord_dataset

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (4, 3, 8, 8), np.uint8)  # CHW like the ref
    path = str(tmp_path / "data.tfrecords")
    with tf.io.TFRecordWriter(path) as w:
        for img in imgs:
            ex = tf.train.Example(features=tf.train.Features(feature={
                "shape": tf.train.Feature(int64_list=tf.train.Int64List(
                    value=img.shape)),
                "data": tf.train.Feature(bytes_list=tf.train.BytesList(
                    value=[img.tobytes()]))}))
            w.write(ex.SerializeToString())

    ds = tfrecord_dataset(path, resolution=0, batch_size=4, shuffle=False,
                          repeat=False)
    batch = next(iter(ds)).numpy()
    assert batch.shape == (4, 8, 8, 3)
    expect = imgs.transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    np.testing.assert_allclose(batch, expect, atol=1e-6)


def test_jit_hoisting_keeps_weights_out_of_the_program():
    """Closed-over weights must ride as jit ARGUMENTS, not HLO constants:
    a 4 MB weight embedded as a dense constant would inflate the lowered
    text past the payload limits that broke 100M+-param models."""
    from dpm_solver_tpu import NoiseScheduleVP, model_wrapper
    from dpm_solver_tpu.solver.sample import _jit_hoisting_constants

    w = jnp.asarray(np.random.RandomState(0).rand(1024, 1024), jnp.float32)
    ns = NoiseScheduleVP.linear()
    mf = model_wrapper(
        lambda x, t: -0.1 * x + 0.0 * jnp.tanh(
            x.reshape(x.shape[0], -1)
            @ w[: x[0].size, : x[0].size]).reshape(x.shape),
        ns)
    from dpm_solver_tpu.solver.sample import execute_plan, make_plan
    from functools import partial

    plan = make_plan(ns, steps=5, order=2, method="multistep")
    fn = partial(execute_plan, mf, plan, predict_x0=True,
                 correcting_x0_fn=None, correcting_xt_fn=None,
                 return_intermediate=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    hoisted = _jit_hoisting_constants(fn, x, None)
    np.testing.assert_allclose(np.asarray(hoisted(x)), np.asarray(fn(x)),
                               rtol=1e-6, atol=1e-6)

    closed = jax.make_jaxpr(lambda xx: fn(xx))(x)
    assert any(np.size(c) >= 1024 * 1024 for c in closed.consts), \
        "expected the weight to be a jaxpr const (the thing we hoist)"
    # and the hoisted program itself must be small
    from jax import core as jcore
    jfn = jax.jit(lambda xx, *cs: jcore.eval_jaxpr(closed.jaxpr, cs, xx))
    txt_len = len(jfn.lower(x, *closed.consts).as_text())
    assert txt_len < 2_000_000, f"lowered text {txt_len/1e6:.1f} MB — weights embedded?"
