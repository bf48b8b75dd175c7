"""SDE library parity vs reference sde_lib + sampler sanity tests.

The analytic sanity oracle: a Gaussian data distribution x0 ~ N(0, c^2 I) has
a closed-form score for every SDE family, so samplers given the *exact* score
must reproduce the marginal statistics of the data at t->0.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpm_solver_tpu.sde import SubVPSDE, VESDE, VPSDE, batch_mul, reverse_sde
from dpm_solver_tpu.samplers import (
    ddim_sampler,
    ddpm_ancestral_sampler,
    get_pc_sampler,
)
from dpm_solver_tpu.score import get_noise_fn, get_score_fn
from dpm_solver_tpu import NoiseScheduleVP

from conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture(scope="module")
def ref_sde_lib():
    path = REFERENCE_ROOT / "examples/score_sde_jax/sde_lib.py"
    if not path.exists():
        pytest.skip("reference sde_lib not available")
    # sde_lib does `from utils import batch_mul`; stub it to avoid the
    # reference utils' tensorflow import.
    stub = types.ModuleType("utils")
    stub.batch_mul = batch_mul
    sys.modules.setdefault("utils", stub)
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_sde_lib", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PAIRS = [
    (VPSDE(), "VPSDE", {}),
    (SubVPSDE(), "subVPSDE", {}),
    (VESDE(), "VESDE", {}),
]


@requires_reference
@pytest.mark.parametrize("ours,ref_name,kw", PAIRS)
def test_sde_parity(ref_sde_lib, ours, ref_name, kw):
    theirs = getattr(ref_sde_lib, ref_name)(**kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([0.1, 0.4, 0.7, 0.99], jnp.float32)

    dm, sm = ours.marginal_prob(x, t)
    dr, sr = theirs.marginal_prob(x, t)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(dr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sr), atol=1e-6)

    fm, gm = ours.sde(x, t)
    fr, gr = theirs.sde(x, t)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gr), atol=1e-6)

    fm, gm = ours.discretize(x, t)
    fr, gr = theirs.discretize(x, t)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fr), atol=1e-6)
    # rtol: our sigma table is float64-derived, the reference's is fp32
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gr), rtol=1e-5, atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(ours.prior_logp(x)), np.asarray(theirs.prior_logp(x)), rtol=1e-6)

    # reverse SDE parity under an analytic score
    score_fn = lambda xx, tt: -0.3 * xx
    rm = reverse_sde(ours, score_fn)
    rr = theirs.reverse(score_fn)
    fm, gm = rm.sde(x, t)
    fr, gr = rr.sde(x, t)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fr), atol=1e-6)
    fm, gm = rm.discretize(x, t)
    fr, gr = rr.discretize(x, t)
    # rev_f amplifies the fp32-vs-float64 sigma-table difference by G^2 (~36
    # for VESDE) -> compare relatively
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fr), rtol=2e-5, atol=1e-6)


def _exact_score(sde, c2=1.0):
    """Score of p_t when x0 ~ N(0, c2 I): N(0, (m_t^2 c2 + s_t^2) I) for VP-like
    (mean coeff m_t), N(0, (c2 + s_t^2) I) for VE."""

    def score(x, t):
        mean, std = sde.marginal_prob(jnp.ones_like(x), t)
        m = mean  # == m_t broadcast
        var = m**2 * c2 + batch_mul(std**2, jnp.ones_like(x))
        return -x / var

    return score


@pytest.mark.parametrize("sde", [VPSDE(N=200), VESDE(N=200)])
@pytest.mark.parametrize("predictor,corrector", [
    ("euler_maruyama", "none"),
    ("reverse_diffusion", "none"),
    ("ancestral_sampling", "none"),
    ("reverse_diffusion", "langevin"),
])
def test_pc_sampler_recovers_gaussian_stats(sde, predictor, corrector):
    """With the exact score of x0 ~ N(0, I), PC samplers must produce samples
    with unit variance and zero mean at t=eps (weak but real correctness)."""
    score_fn = _exact_score(sde)
    sampler = get_pc_sampler(sde, score_fn, predictor=predictor,
                             corrector=corrector, denoise=True)
    rng = jax.random.key(0)
    x_T = sde.prior_sampling(jax.random.key(1), (512, 4, 1, 1))
    x0, nfe = jax.jit(sampler)(x_T, rng)
    x0 = np.asarray(x0).reshape(-1)
    assert int(nfe) >= sde.N
    assert abs(x0.mean()) < 0.1, (predictor, corrector, x0.mean())
    assert abs(x0.std() - 1.0) < 0.12, (predictor, corrector, x0.std())


@requires_reference
def test_ddim_matches_reference_generalized_steps(reference_torch_module):
    """Our scanned DDIM vs the torch example's `generalized_steps` (eta=0)."""
    import importlib.util

    import torch

    path = REFERENCE_ROOT / "examples/ddpm_and_guided-diffusion/functions/denoising.py"
    if not path.exists():
        pytest.skip("reference denoising.py unavailable")
    spec = importlib.util.spec_from_file_location("ref_denoise", path)
    ref_den = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_den)

    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    ns = NoiseScheduleVP.discrete(betas=betas)

    def mj(x, t):
        tt = jnp.reshape(t, (-1, 1, 1, 1))
        return jnp.sin(3.0 * x) * jnp.cos(0.001 * tt) + 0.05 * x

    def mt(x, t):
        tt = torch.reshape(t.float(), (-1, 1, 1, 1))
        return torch.sin(3.0 * x) * torch.cos(0.001 * tt) + 0.05 * x

    steps = 10
    seq = np.linspace(0, 999, steps + 1)[1:].astype(np.int64)
    seq = list(np.unique(seq))

    x0 = np.random.default_rng(0).standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        xs = ref_den.generalized_steps(
            torch.tensor(x0), seq, mt, torch.tensor(betas, dtype=torch.float32), eta=0.0)
    want = xs[0][-1].numpy()

    sampler = ddim_sampler(mj, ns, steps=steps, eta=0.0)
    got = np.asarray(jax.jit(sampler)(jnp.asarray(x0)))
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=1e-4)


def test_ddpm_ancestral_runs_and_is_finite():
    betas = np.linspace(1e-4, 0.02, 100, dtype=np.float64)
    ns = NoiseScheduleVP.discrete(betas=betas)
    model = lambda x, t: 0.1 * x
    sampler = ddpm_ancestral_sampler(model, ns, steps=20)
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    out = jax.jit(sampler)(x, jax.random.key(1))
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_score_noise_fn_conventions():
    vp = VPSDE()
    calls = {}

    def model(x, labels):
        calls["labels"] = labels
        return 0.5 * x

    score = get_score_fn(vp, model, continuous=True)
    x = jnp.ones((2, 4))
    t = jnp.asarray([0.5, 0.5])
    s = score(x, t)
    np.testing.assert_allclose(np.asarray(calls["labels"]), [499.5, 499.5], rtol=1e-6)
    std = vp.marginal_prob(jnp.zeros_like(x), t)[1]
    np.testing.assert_allclose(np.asarray(s), np.asarray(-0.5 * x / std[:, None]), rtol=1e-6)

    noise = get_noise_fn(vp, model, continuous=True)
    np.testing.assert_allclose(np.asarray(noise(x, t)), 0.5 * np.asarray(x), rtol=1e-6)

    ve = VESDE()
    score_ve = get_score_fn(ve, model, continuous=True)
    s = score_ve(x, t)
    np.testing.assert_allclose(np.asarray(calls["labels"]),
                               np.asarray(ve.sigma(t)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), 0.5 * np.asarray(x), rtol=1e-6)
