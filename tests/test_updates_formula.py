"""Coefficient-level parity: every update rule vs the reference's update
functions with *identical* times/ratios (no grid construction involved).

These pin the formulas themselves to ~1e-5; the end-to-end tests in
test_solver_parity.py then cover drivers/grids with tolerances that account
for the reference's own fp32 grid arithmetic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dpm_solver_tpu import NoiseScheduleVP, model_wrapper
from dpm_solver_tpu.solver import updates as U

from conftest import requires_reference

SHAPE = (2, 3, 4, 4)


def scaled_close(got, want, tol=5e-5):
    scale = max(1.0, float(np.max(np.abs(want))))
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=tol)


@pytest.fixture(scope="module")
def pair(reference_torch_module):
    import torch

    ref = reference_torch_module
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    ns_j = NoiseScheduleVP.discrete(betas=betas)
    ns_t = ref.NoiseScheduleVP("discrete", betas=torch.tensor(betas, dtype=torch.float32))
    return ns_j, ns_t, ref


TIMES = [(0.9, 0.6), (0.5, 0.35), (0.2, 0.05)]


@requires_reference
@pytest.mark.parametrize("algo", ["dpmsolver", "dpmsolver++"])
@pytest.mark.parametrize("solver_type", ["dpmsolver", "taylor"])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_multistep_coefficients(pair, algo, solver_type, order):
    """Pure coefficient check: reference multistep updates accept arbitrary
    model-value tensors, so no model is involved at all."""
    import torch

    ns_j, ns_t, ref = pair
    solver_t = ref.DPM_Solver(lambda x, t: x, ns_t, algorithm_type=algo)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    ms = [rng.standard_normal(SHAPE).astype(np.float32) for _ in range(order)]

    for s, t in TIMES:
        t_prev = list(np.linspace(s + 0.08 * (order - 1), s, order))  # decreasing to s
        a, b, _ = U.multistep_row(ns_j, t_prev, t, order,
                                  algorithm_type=algo, solver_type=solver_type)
        # our history is newest-first; ms[-1] is newest (matches t_prev[-1])
        got = (np.float32(a) * x + np.float32(b[0]) * ms[-1]
               + np.float32(b[1]) * (ms[-2] if order > 1 else 0)
               + np.float32(b[2]) * (ms[-3] if order > 2 else 0))
        tl = [torch.tensor(np.asarray([ti], dtype=np.float32)) for ti in t_prev]
        ml = [torch.tensor(m) for m in ms]
        tt = torch.tensor([t], dtype=torch.float32)
        if order == 1:
            want = solver_t.dpm_solver_first_update(
                torch.tensor(x), tl[-1], tt, model_s=ml[-1]).numpy()
        elif order == 2:
            want = solver_t.multistep_dpm_solver_second_update(
                torch.tensor(x), ml, tl, tt, solver_type=solver_type).numpy()
        else:
            want = solver_t.multistep_dpm_solver_third_update(
                torch.tensor(x), ml, tl, tt, solver_type=solver_type).numpy()
        scaled_close(got, want)


@requires_reference
@pytest.mark.parametrize("algo", ["dpmsolver", "dpmsolver++"])
@pytest.mark.parametrize("solver_type", ["dpmsolver", "taylor"])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_singlestep_segments(pair, algo, solver_type, order):
    """Execute our micro-rows for one segment against the reference's
    singlestep update (same s, t, r1, r2; shared toy model)."""
    import torch

    ns_j, ns_t, ref = pair

    def mj(x, t_in):
        t = jnp.reshape(t_in, (-1,) + (1,) * (x.ndim - 1))
        return jnp.sin(3.0 * x) * jnp.cos(0.01 * t) + 0.1 * x

    def mt(x, t_in):
        t = torch.reshape(t_in, (-1,) + (1,) * (x.dim() - 1))
        return torch.sin(3.0 * x) * torch.cos(0.01 * t) + 0.1 * x

    fj = model_wrapper(mj, ns_j)
    ft = ref.model_wrapper(mt, ns_t)
    solver_t = ref.DPM_Solver(ft, ns_t, algorithm_type=algo)
    predict_x0 = algo == "dpmsolver++"

    def eval_fn(x, t):
        t = jnp.asarray(t, jnp.float32)
        eps = fj(x, t)
        if not predict_x0:
            return eps
        return (x - ns_j.marginal_std(t) * eps) / ns_j.marginal_alpha(t)

    r1 = 0.4 if order == 2 else (0.35 if order == 3 else None)
    r2 = 0.75 if order == 3 else None
    rng = np.random.default_rng(1)
    for s, t in TIMES:
        x0 = rng.standard_normal(SHAPE).astype(np.float32)
        rows = U.singlestep_segment_rows(ns_j, s, t, order, r1=r1, r2=r2,
                                         algorithm_type=algo, solver_type=solver_type)
        x = jnp.asarray(x0)
        hist = [eval_fn(x, s), jnp.zeros_like(x), jnp.zeros_like(x)]
        out = None
        for (tn, a, b, ev) in rows:
            y = (np.float32(a) * x + np.float32(b[0]) * hist[0]
                 + np.float32(b[1]) * hist[1] + np.float32(b[2]) * hist[2])
            if ev:
                hist = [eval_fn(y, float(tn))] + hist[:-1]
            else:
                out = y
        got = np.asarray(out)

        ts = torch.tensor([s], dtype=torch.float32)
        tt = torch.tensor([t], dtype=torch.float32)
        want = solver_t.singlestep_dpm_solver_update(
            torch.tensor(x0), ts, tt, order, solver_type=solver_type, r1=r1, r2=r2
        ).numpy()
        scaled_close(got, want)


def test_sde_marginal_preservation():
    """Analytic correctness of the SDE updates: with a model whose x0
    prediction is a constant c, each SDE-DPM-Solver++ step preserves the exact
    marginal q(x_t|x0=c) = N(alpha_t c, sigma_t^2) (mean AND variance)."""
    ns = NoiseScheduleVP.linear()
    c = 0.7
    for s, t in [(0.9, 0.6), (0.5, 0.2)]:
        a_row, b_row, s_noise = U.multistep_row(
            ns, [s], t, 1, algorithm_type="sde-dpmsolver++")
        alpha_s, sigma_s = ns.marginal_alpha_np(s), ns.marginal_std_np(s)
        alpha_t, sigma_t = ns.marginal_alpha_np(t), ns.marginal_std_np(t)
        # x_s ~ N(alpha_s c, sigma_s^2) -> x_t = a x_s + b0*c + s*z
        mean_t = a_row * alpha_s * c + b_row[0] * c
        var_t = a_row**2 * sigma_s**2 + s_noise**2
        np.testing.assert_allclose(mean_t, alpha_t * c, rtol=1e-6)
        np.testing.assert_allclose(var_t, sigma_t**2, rtol=1e-6)
        # eps-space variant preserves the marginal too: eps_hat(x) = (x - alpha c)/sigma
        a2, b2, s2 = U.multistep_row(ns, [s], t, 1, algorithm_type="sde-dpmsolver")
        # eps-space: E[x_t] = a2 alpha_s c (E[eps_hat] = 0 at the mean); the
        # variance is NOT exactly preserved (eps_hat depends on x, and the
        # eps-form holds it constant over the step), so check mean + the
        # noise-scale formula only.
        np.testing.assert_allclose(a2 * alpha_s * c, alpha_t * c, rtol=1e-6)
        h = ns.marginal_lambda_np(t) - ns.marginal_lambda_np(s)
        np.testing.assert_allclose(s2, sigma_t * np.sqrt(np.expm1(2 * h)), rtol=1e-9)


def test_sde_ode_exact_identities():
    """SDE-DPM-Solver++ first order relates to the ODE update by exact
    identities: A_sde = A_ode e^{-h}, b_sde = b_ode (1 + e^{-h}),
    s_noise = sigma_t sqrt(1 - e^{-2h})."""
    ns = NoiseScheduleVP.linear()
    for (s, t) in [(0.5, 0.499), (0.9, 0.6), (0.3, 0.05)]:
        a_o, b_o, _ = U.multistep_row(ns, [s], t, 1, algorithm_type="dpmsolver++")
        a_s, b_s, sn = U.multistep_row(ns, [s], t, 1, algorithm_type="sde-dpmsolver++")
        h = ns.marginal_lambda_np(t) - ns.marginal_lambda_np(s)
        np.testing.assert_allclose(a_s, a_o * np.exp(-h), rtol=1e-9)
        np.testing.assert_allclose(b_s[0], b_o[0] * (1 + np.exp(-h)), rtol=1e-9)
        np.testing.assert_allclose(
            sn, ns.marginal_std_np(t) * np.sqrt(-np.expm1(-2 * h)), rtol=1e-9)
