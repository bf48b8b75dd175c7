"""Empirical order-of-convergence on an analytically solvable ODE
(SURVEY.md §4 test-pyramid item b — absent from the reference).

With a data-prediction model that depends only on time,
x0_hat(t) = lambda(t)^3, the DPM-Solver++ ODE in half-logSNR form

    d(x/sigma)/dlambda = e^lambda * x0_hat(lambda)

has the closed-form solution x(t)/sigma_t = x(s)/sigma_s + F(l_t) - F(l_s)
with F(l) = e^l (l^3 - 3l^2 + 6l - 6), so the global error of an order-k
singlestep solver must shrink ~h^k.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu import DPM_Solver, NoiseScheduleVP, model_wrapper

BETA0, BETA1 = 0.1, 20.0
T_START, T_END = 1.0, 0.4


def _log_alpha(t):
    return -0.25 * t**2 * (BETA1 - BETA0) - 0.5 * t * BETA0


def _lam(t):
    la = _log_alpha(t)
    sigma = jnp.sqrt(-jnp.expm1(2.0 * la))
    return la - jnp.log(sigma)


def _F(l):
    return np.exp(l) * (l**3 - 3 * l**2 + 6 * l - 6)


def _exact(x_T):
    lT = float(_lam(jnp.asarray(T_START)))
    l0 = float(_lam(jnp.asarray(T_END)))
    sT = float(jnp.sqrt(-jnp.expm1(2.0 * _log_alpha(jnp.asarray(T_START)))))
    s0 = float(jnp.sqrt(-jnp.expm1(2.0 * _log_alpha(jnp.asarray(T_END)))))
    return s0 * (np.asarray(x_T) / sT + _F(l0) - _F(lT))


def _solve(x_T, steps, order, method):
    ns = NoiseScheduleVP.linear(BETA0, BETA1)

    def model(x, t):
        return jnp.broadcast_to(_lam(t)[:, None] ** 3, x.shape)

    model_fn = model_wrapper(model, ns, model_type="x_start")
    solver = DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
    return np.asarray(solver.sample(
        x_T, steps=steps, t_start=T_START, t_end=T_END, order=order,
        skip_type="logSNR", method=method, lower_order_final=False))


# Measured rates (fp32): singlestep-3 with the reference's r1=1/3, r2=2/3
# nodes converges at ~2.2 on this problem (trajectory parity vs the torch
# reference holds to 1e-4, so this is the reference algorithm's behavior,
# not an implementation defect); multistep-3 shows clean >=3rd order until
# the fp32 floor (~5e-4).
@pytest.mark.parametrize("method,order,min_rate", [
    ("singlestep", 1, 0.8),
    ("singlestep", 2, 1.7),
    ("singlestep", 3, 1.9),
    ("multistep", 2, 1.7),
    ("multistep", 3, 2.5),
])
def test_order_of_convergence(method, order, min_rate):
    x_T = np.full((2, 4), 0.7, np.float32)
    want = _exact(x_T)
    errs = []
    for steps in (6, 12, 24):
        got = _solve(jnp.asarray(x_T), steps, order, method)
        errs.append(float(np.abs(got - want).max()))
    # error must shrink with the prescribed rate between halvings
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > min_rate, (method, order, errs, rates)
    # and a higher-order method beats order 1 at fixed NFE
    if order > 1:
        coarse = float(np.abs(
            _solve(jnp.asarray(x_T), 12, 1, "singlestep") - want).max())
        assert errs[1] < coarse
