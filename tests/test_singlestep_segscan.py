"""The scanned same-order singlestep groups (solver/plan.py::SegScan) must
execute bit-identically to the fully-unrolled micro-op tail they replaced —
same coefficient tables, same trajectory, including correcting_xt hooks and
return_intermediate capture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.schedule import NoiseScheduleVP
from dpm_solver_tpu.solver.plan import build_singlestep_plan
from dpm_solver_tpu.solver.sample import execute_plan


def _model():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((3, 3)),
                    jnp.float32) * 0.2

    def fn(x, t):
        return jnp.tanh(x @ w) + 0.1 * jnp.sin(
            37.0 * jnp.asarray(t).reshape((-1,) + (1,) * (x.ndim - 1)))

    return fn


@pytest.mark.parametrize("steps,order,fixed", [
    (10, 3, False), (20, 3, False), (10, 2, False), (9, 3, False),
    (12, 3, True), (7, 1, False),
])
@pytest.mark.parametrize("algorithm_type", ["dpmsolver++", "dpmsolver"])
def test_scanned_groups_match_unrolled(steps, order, fixed, algorithm_type):
    ns = NoiseScheduleVP.linear()
    model_fn = _model()
    x = jax.random.normal(jax.random.key(1), (4, 8, 3))
    kw = dict(t_end=1e-3, skip_type="logSNR", fixed=fixed,
              algorithm_type=algorithm_type)
    plan_scan = build_singlestep_plan(ns, steps, order, **kw)
    plan_flat = build_singlestep_plan(ns, steps, order, min_scan=10**9, **kw)
    assert plan_scan.seg_scans and plan_flat.seg_scans == ()
    assert plan_scan.n_nfe == plan_flat.n_nfe

    hook_calls = []

    def correcting_xt(xx, t, step):
        hook_calls.append(1)
        return xx * (1.0 + 1e-3 * jnp.cos(jnp.asarray(t, jnp.float32)))

    px0 = algorithm_type.endswith("++")
    run = lambda plan: execute_plan(
        model_fn, plan, x, predict_x0=px0, correcting_xt_fn=correcting_xt,
        return_intermediate=True)
    out_s, inter_s = jax.jit(lambda: run(plan_scan))()
    out_f, inter_f = jax.jit(lambda: run(plan_flat))()
    # scan vs unrolled compile to differently-associated fp32 arithmetic;
    # agreement is at reassociation noise (~1e-7 relative), not bitwise
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                               rtol=5e-5, atol=5e-4)
    assert len(inter_s) == len(inter_f)
    for a, b in zip(inter_s, inter_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-4)
