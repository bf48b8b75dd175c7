"""Independent mathematical validation of the SDE-DPM-Solver(++) updates.

The reference repo contains no SDE solver (SURVEY §1 "Not implemented
anywhere"), so these tests validate against *closed-form math* rather than
reference code:

1. Analytic linear (OU / linear-Gaussian) reverse SDE. For 1-D data
   x_0 ~ N(mu0, s0^2) under the VP forward process, every marginal is
   Gaussian, q(x_t) = N(alpha_t mu0, alpha_t^2 s0^2 + sigma_t^2), and the
   exact MMSE noise predictor eps(x,t) = sigma_t (x - alpha_t mu0) / var_t is
   linear in x. By the time-reversal theorem the reverse SDE with this exact
   score has the forward marginals, so the solver's terminal distribution
   must converge to q(x_{t_0}). Because the model is linear, the solver
   iterate is an explicit linear function of (x_T, z_1..z_K) — we track
   those coefficients exactly (no Monte Carlo) and compare the resulting
   terminal mean/std against the analytic values at several step counts,
   asserting the error decays at the expected rate.

2. Monte-Carlo check of the real jitted executor (`build_sampler`) against
   the exact linear tracking — validates the scan/history/noise wiring
   (per-step independent draws, s_noise scaling), not just the coefficients.

3. SDE-DPM-Solver++ order 1 on consecutive points of a discrete beta grid
   is EXACTLY the ancestral DDPM sampler with the posterior (beta-tilde)
   variance (ref ancestral sampler: functions/denoising.py:54-104):
     coef_x  = sqrt(a_j) (1-abar_{j-1}) / (1-abar_j)
     coef_x0 = sqrt(abar_{j-1}) beta_j / (1-abar_j)
     var     = beta_j (1-abar_{j-1}) / (1-abar_j)
   The identity 1 - e^{-2h} = (1 - abar_j/abar_{j-1} * s^2_{j-1}/s^2_j)
   makes the match algebraic, not approximate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver import updates as U
from dpm_solver_tpu.solver.plan import build_multistep_plan
from dpm_solver_tpu.solver.sample import build_sampler

MU0, S0 = 0.7, 0.31
T0, TT = 1e-3, 1.0


def _marg(ns, t):
    return float(ns.marginal_alpha_np(t)), float(ns.marginal_std_np(t))


def _exact_eps_fn(ns):
    """The exact MMSE noise predictor for x_0 ~ N(MU0, S0^2), vectorized."""

    def model_fn(x, t):
        a = ns.marginal_alpha(t)
        s = ns.marginal_std(t)
        var_t = a * a * S0 * S0 + s * s
        return s * (x - a * MU0) / var_t

    return model_fn


def _terminal_lin(ns, plan, predict_x0):
    """Exact terminal (mean, var) of the solver iterate on the linear model.

    Each random variable is represented as a coefficient vector over the
    basis (1, x_T, z_1, ..., z_K); all solver operations are affine in that
    basis, and linear model evals stay affine.
    """
    aT, sT = _marg(ns, plan.t_first)
    varT = aT * aT * S0 * S0 + sT * sT
    n_rows = ((plan.scan_rows.n_ops if plan.scan_rows is not None else 0)
              + len(plan.tail_step_index))
    dim = 2 + n_rows + 1

    def vec(c=0.0, u=0.0):
        v = np.zeros(dim)
        v[0], v[1] = c, u
        return v

    def eval_model(xv, t):
        a, s = _marg(ns, float(t))
        var_t = a * a * S0 * S0 + s * s
        eps = s / var_t * xv.copy()
        eps[0] += -s * a * MU0 / var_t
        if not predict_x0:
            return eps
        return (xv - s * eps) / a

    x = vec(0.0, 1.0)
    hist = [eval_model(x, plan.t_first), vec(), vec()]
    rows = []
    if plan.scan_rows is not None:
        r = plan.scan_rows
        rows += [(float(r.a[i]), np.asarray(r.b[i]), float(r.s_noise[i]),
                  float(r.t_next[i]), True, True) for i in range(r.n_ops)]
    if plan.tail_rows is not None:
        r = plan.tail_rows
        rows += [(float(r.a[k]), np.asarray(r.b[k]), float(r.s_noise[k]),
                  float(r.t_next[k]), plan.tail_eval[k], plan.tail_commit[k])
                 for k in range(r.n_ops)]
    zi = 2
    for a_, b_, s_, t_next, ev, commit in rows:
        y = a_ * x + b_[0] * hist[0] + b_[1] * hist[1] + b_[2] * hist[2]
        if s_ != 0.0:
            y = y.copy()
            y[zi] += s_
        zi += 1
        if commit:
            x = y
        if ev:
            hist = [eval_model(y, t_next)] + hist[:-1]
    mean = x[0] + x[1] * aT * MU0
    var = x[1] ** 2 * varT + float(np.sum(x[2:] ** 2))
    return mean, var


def _analytic_terminal(ns):
    a0, s0 = _marg(ns, T0)
    return a0 * MU0, a0 * a0 * S0 * S0 + s0 * s0


@pytest.mark.parametrize("algorithm_type,order", [
    ("sde-dpmsolver++", 1), ("sde-dpmsolver++", 2),
    ("sde-dpmsolver", 1), ("sde-dpmsolver", 2),
])
def test_sde_terminal_distribution_converges_to_analytic(algorithm_type, order):
    ns = NoiseScheduleVP.linear()
    true_mean, true_var = _analytic_terminal(ns)
    predict_x0 = U.is_predict_x0(algorithm_type)

    errs = {}
    for steps in (10, 80):
        plan = build_multistep_plan(
            ns, steps, order, t_start=TT, t_end=T0, skip_type="logSNR",
            algorithm_type=algorithm_type)
        m, v = _terminal_lin(ns, plan, predict_x0)
        # exponential integrators are exact on the linear mean dynamics
        assert abs(m - true_mean) < 1e-6, (steps, m, true_mean)
        errs[steps] = abs(np.sqrt(v) - np.sqrt(true_var))

    # measured decay (scratch-calibrated): ++/o1 ~O(h) (5.8x from 10->80
    # steps), ++/o2 and eps-space ~O(h^2)-ish (>=10x); assert conservative
    # bounds well outside noise but inside the measured rates
    assert errs[80] < 0.02, errs
    assert errs[10] / errs[80] > 4.0, errs
    if not (algorithm_type == "sde-dpmsolver++" and order == 1):
        assert errs[80] < 2e-3, errs


def test_sde_order2_beats_order1_at_same_nfe():
    ns = NoiseScheduleVP.linear()
    _, true_var = _analytic_terminal(ns)
    errs = {}
    for order in (1, 2):
        plan = build_multistep_plan(
            ns, 40, order, t_start=TT, t_end=T0, skip_type="logSNR",
            algorithm_type="sde-dpmsolver++")
        _, v = _terminal_lin(ns, plan, True)
        errs[order] = abs(np.sqrt(v) - np.sqrt(true_var))
    assert errs[2] < 0.25 * errs[1], errs


@pytest.mark.parametrize("algorithm_type,order", [
    ("sde-dpmsolver++", 1), ("sde-dpmsolver++", 2), ("sde-dpmsolver", 2),
])
def test_executor_matches_exact_linear_tracking(algorithm_type, order):
    """MC through the real jitted sampler vs the exact affine tracking."""
    ns = NoiseScheduleVP.linear()
    steps = 20
    predict_x0 = U.is_predict_x0(algorithm_type)
    plan = build_multistep_plan(
        ns, steps, order, t_start=TT, t_end=T0, skip_type="logSNR",
        algorithm_type=algorithm_type)
    exp_mean, exp_var = _terminal_lin(ns, plan, predict_x0)

    model_fn = _exact_eps_fn(ns)
    fn = build_sampler(model_fn, ns, steps=steps, order=order,
                       method="multistep", skip_type="logSNR",
                       t_start=TT, t_end=T0, algorithm_type=algorithm_type)
    B = 200_000
    rng = jax.random.key(7)
    aT, sT = _marg(ns, TT)
    x_T = (aT * MU0 + np.sqrt(aT * aT * S0 * S0 + sT * sT)
           * jax.random.normal(jax.random.key(3), (B, 1, 1, 1)))
    out = np.asarray(jax.jit(fn)(jnp.asarray(x_T, jnp.float32), rng=rng))
    assert np.isfinite(out).all()
    # ~5 standard errors at B=200k: SE(mean) ~ 7e-4, SE(std) ~ 5e-4
    assert abs(out.mean() - exp_mean) < 4e-3, (out.mean(), exp_mean)
    assert abs(out.std() - np.sqrt(exp_var)) < 3e-3, (out.std(), np.sqrt(exp_var))


def test_sde_dpmsolver_pp_order1_is_ancestral_ddpm():
    """Order-1 SDE-DPM-Solver++ on consecutive discrete grid points ==
    ancestral DDPM with the posterior (beta-tilde) variance, exactly."""
    betas = np.linspace(1e-4, 0.02, 1000)
    ns = NoiseScheduleVP.discrete(betas=betas)
    abar = np.cumprod(1.0 - betas)
    N = len(betas)
    js = np.arange(1, N)  # transition j -> j-1, time (j+1)/N -> j/N
    A = np.empty(len(js))
    b0 = np.empty(len(js))
    sn = np.empty(len(js))
    for i, j in enumerate(js):
        A[i], (b0[i], _, _), sn[i] = U.multistep_row(
            ns, [(j + 1) / N], j / N, 1,
            algorithm_type="sde-dpmsolver++", lib=np)
    a_j = 1.0 - betas[js]
    coef_x = np.sqrt(a_j) * (1.0 - abar[js - 1]) / (1.0 - abar[js])
    coef_x0 = np.sqrt(abar[js - 1]) * betas[js] / (1.0 - abar[js])
    var_tilde = (1.0 - abar[js - 1]) / (1.0 - abar[js]) * betas[js]
    # discrete-table lambda interpolation bounds the match at ~1e-4 relative
    # (the repo's global parity bar); the identity itself is exact
    np.testing.assert_allclose(A, coef_x, rtol=2e-6)
    np.testing.assert_allclose(b0, coef_x0, rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(sn, np.sqrt(var_tilde), rtol=1e-4)
