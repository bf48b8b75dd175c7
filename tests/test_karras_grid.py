"""Karras rho=7 time grid (skip_type="karras").

Not in the reference's own grids (dpm_solver_pytorch.py:453-480); it is the
`use_karras_sigmas` spacing of diffusers' DPM-Solver schedulers, which the
reference README recommends (README.md:46,71-79).  Tests pin the closed-form
sigma ramp (arXiv:2206.00364 eq. 5), grid invariants shared with the other
skip types, and full trajectory parity vs the reference torch solver driven
through the same grid.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dpm_solver_tpu import NoiseScheduleVP
from dpm_solver_tpu.solver.plan import get_time_steps

from conftest import requires_reference


def _discrete_ns():
    betas = np.linspace(1e-4, 2e-2, 1000, dtype=np.float64)
    return NoiseScheduleVP("discrete", betas=jnp.asarray(betas))


@pytest.mark.parametrize("schedule", ["discrete", "linear"])
@pytest.mark.parametrize("N", [5, 10, 20])
def test_karras_grid_invariants(schedule, N):
    ns = (_discrete_ns() if schedule == "discrete"
          else NoiseScheduleVP("linear"))
    t_T, t_0 = (1.0, 1e-3) if schedule == "linear" else (1.0, 1e-3)
    ts = get_time_steps(ns, "karras", t_T, t_0, N)
    assert ts.shape == (N + 1,)
    assert np.all(np.diff(ts) < 0), "grid must be strictly decreasing in t"
    # Endpoints coincide with every other skip type (up to the lambda<->t
    # round-trip, exact to ~1e-10 in the float64 host twins).
    assert abs(ts[0] - t_T) < 1e-8
    assert abs(ts[-1] - t_0) < 1e-8


def test_karras_sigma_ramp_closed_form():
    """sigma(t_i) = (smax^(1/7) + i/N*(smin^(1/7)-smax^(1/7)))^7 exactly."""
    ns = _discrete_ns()
    N, t_T, t_0 = 10, 1.0, 1e-3
    ts = get_time_steps(ns, "karras", t_T, t_0, N)
    lam = np.asarray(ns.marginal_lambda_np(ts), dtype=np.float64)
    sig = np.exp(-lam)  # noise-to-signal sigma_t/alpha_t
    smax = float(np.exp(-ns.marginal_lambda_np(np.float64(t_T))))
    smin = float(np.exp(-ns.marginal_lambda_np(np.float64(t_0))))
    ramp = np.linspace(0.0, 1.0, N + 1)
    want = (smax ** (1 / 7.0) + ramp * (smin ** (1 / 7.0)
                                        - smax ** (1 / 7.0))) ** 7.0
    np.testing.assert_allclose(sig, want, rtol=1e-7)
    # rho=7 concentrates points at low noise: the last sigma gap must be far
    # smaller than the first.
    assert (sig[0] - sig[1]) > 20 * (sig[-2] - sig[-1])


def test_karras_differs_from_logSNR_interior():
    ns = _discrete_ns()
    ts_k = get_time_steps(ns, "karras", 1.0, 1e-3, 10)
    ts_l = get_time_steps(ns, "logSNR", 1.0, 1e-3, 10)
    assert np.max(np.abs(ts_k[1:-1] - ts_l[1:-1])) > 1e-3


@requires_reference
@pytest.mark.parametrize("method,order", [("multistep", 2), ("multistep", 3),
                                          ("singlestep", 3)])
def test_karras_trajectory_parity(reference_torch_module, method, order):
    """Reference solver driven through our karras grid (grid patch as in
    test_solver_parity) must match our one-program trajectory to 1e-4."""
    from test_solver_parity import (make_pair, patch_reference_grids,
                                    run_both)

    solver_j, solver_t = make_pair(reference_torch_module, "discrete",
                                   "dpmsolver++")
    patch_reference_grids(solver_t, solver_j.noise_schedule)
    run_both(solver_j, solver_t, steps=10, order=order, method=method,
             skip_type="karras", tol=2e-4)


def test_karras_unipc_runs():
    """UniPC over the karras grid compiles and produces finite output."""
    from dpm_solver_tpu import DPM_Solver, model_wrapper

    ns = _discrete_ns()
    model = model_wrapper(
        lambda x, t: jnp.sin(3.0 * x)
        * jnp.cos(0.01 * jnp.reshape(t, (-1,) + (1,) * (x.ndim - 1))),
        ns, model_type="noise")
    solver = DPM_Solver(model, ns, algorithm_type="dpmsolver++")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 3)),
                    jnp.float32)
    out = solver.sample(x, steps=8, order=2, method="unipc",
                        skip_type="karras")
    assert np.all(np.isfinite(np.asarray(out)))
