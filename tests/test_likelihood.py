"""RK45 integrator + likelihood (bits/dim) tests.

Oracles: closed-form linear ODEs, scipy solve_ivp, and the analytically
tractable case of a VP diffusion with the *exact* score of N(0, I) data —
there the Hutchinson estimate is exact (isotropic Jacobian x Rademacher
probe) and bits/dim must match the standard-normal log-density.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.likelihood import get_likelihood_fn, ode_sampler
from dpm_solver_tpu.ode import odeint_rk45
from dpm_solver_tpu.sde import VPSDE


def test_rk45_matches_closed_form_and_scipy():
    from scipy.integrate import solve_ivp

    a = np.array([[-0.5, 0.2], [-0.1, -0.3]], dtype=np.float32)
    y0 = np.array([1.0, -2.0], dtype=np.float32)

    got, nfe = odeint_rk45(lambda y, t: jnp.asarray(a) @ y, jnp.asarray(y0),
                           0.0, 3.0, rtol=1e-6, atol=1e-8)
    sol = solve_ivp(lambda t, y: a @ y, (0.0, 3.0), y0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got), sol.y[:, -1], rtol=1e-4,
                               atol=1e-6)
    assert int(nfe) > 6


def test_rk45_backward_integration():
    # dy/dt = y integrated backward from t=1 to 0: y(0) = y(1)/e
    got, _ = odeint_rk45(lambda y, t: y, jnp.asarray([2.0]), 1.0, 0.0,
                         rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(got[0]), 2.0 / math.e, rtol=1e-4)


def test_rk45_pytree_state_and_jit():
    f = jax.jit(lambda: odeint_rk45(
        lambda s, t: (s[0] * 0.0 + 1.0, -s[1]),
        (jnp.zeros((2, 2)), jnp.ones((3,))), 0.0, 2.0))
    (y1, y2), nfe = f()
    np.testing.assert_allclose(np.asarray(y1), np.full((2, 2), 2.0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.full((3,), math.exp(-2.0)),
                               rtol=1e-4)


def _exact_score(sde):
    """Score of the marginal when data ~ N(0, I): -x / (alpha_t^2 + sigma_t^2)."""

    def score_fn(x, t):
        mean_coef, sigma = sde.marginal_prob(jnp.ones_like(x), t)
        sigma = sigma.reshape(sigma.shape + (1,) * (x.ndim - sigma.ndim))
        return -x / (mean_coef ** 2 + sigma ** 2)

    return score_fn


def test_bits_per_dim_exact_gaussian():
    sde = VPSDE()
    score_fn = _exact_score(sde)
    lik = get_likelihood_fn(sde, score_fn, rtol=1e-5, atol=1e-5, eps=1e-5,
                            inverse_scaler_grad=1.0)
    rng = jax.random.PRNGKey(0)
    data = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 2))
    bpd, z, nfe = lik(rng, data)
    # analytic: -log2 N(x; 0, I) / n_dim + 8
    n = data[0].size
    logp = -0.5 * (np.sum(np.asarray(data) ** 2, axis=(1, 2, 3))
                   + n * math.log(2 * math.pi))
    want = -logp / n / math.log(2.0) + 8.0
    np.testing.assert_allclose(np.asarray(bpd), want, atol=2e-2)
    assert int(nfe) > 10
    assert np.isfinite(np.asarray(z)).all()


def test_ode_sampler_recovers_gaussian():
    sde = VPSDE()
    score_fn = _exact_score(sde)
    x, nfe = ode_sampler(sde, score_fn, (512, 2, 2, 2), jax.random.PRNGKey(2),
                         rtol=1e-4, atol=1e-4, eps=1e-3)
    x = np.asarray(x)
    assert np.isfinite(x).all()
    # marginal at eps should be ~ N(0, I)
    assert abs(x.mean()) < 0.1
    assert abs(x.std() - 1.0) < 0.1
    assert int(nfe) > 10
