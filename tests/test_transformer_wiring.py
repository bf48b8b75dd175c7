"""Per-site LN-fusion wiring in the SD transformer block.

The block owns the pre-LN params (tree-identical to nn.LayerNorm) and the
sub-modules route LN->proj pairs through ops/ln_linear.py only inside
measured-win regimes (_SITE_WINS). These tests pin:
  * the param tree is byte-identical whichever way the dispatch goes
    (checkpoints must load regardless of shape regime), and
  * enabling fusion at every site changes nothing numerically.
Reference twin: examples/stable-diffusion/ldm/modules/attention.py:196-215.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpm_solver_tpu.models.transformer import SpatialTransformer
from dpm_solver_tpu.ops import ln_linear as LL


@pytest.fixture
def wins_everywhere(monkeypatch):
    monkeypatch.setattr(LL, "_SITE_WINS", {
        "qkv": [(0, 1 << 60)],
        "q_cross": [(0, 1 << 60)],
        "ff_in": [(0, 1 << 60)],
    })


def _build(dtype=jnp.float32):
    model = SpatialTransformer(heads=2, dim_head=64, depth=1, dtype=dtype)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 128)),
                    jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 7, 128)),
                      jnp.float32)
    return model, x, ctx


def test_param_tree_identical_under_fusion(wins_everywhere):
    model, x, ctx = _build()
    fused = jax.tree_util.tree_structure(
        model.init(jax.random.PRNGKey(0), x, ctx))

    import dpm_solver_tpu.ops.ln_linear as mod
    saved = mod._SITE_WINS
    mod._SITE_WINS = {"qkv": [], "q_cross": [], "ff_in": []}
    try:
        unfused = jax.tree_util.tree_structure(
            model.init(jax.random.PRNGKey(0), x, ctx))
    finally:
        mod._SITE_WINS = saved
    assert fused == unfused


def test_fusion_is_numerically_invisible(wins_everywhere):
    model, x, ctx = _build()
    params = model.init(jax.random.PRNGKey(0), x, ctx)
    got = model.apply(params, x, ctx)

    import dpm_solver_tpu.ops.ln_linear as mod
    saved = mod._SITE_WINS
    mod._SITE_WINS = {"qkv": [], "q_cross": [], "ff_in": []}
    try:
        want = model.apply(params, x, ctx)
    finally:
        mod._SITE_WINS = saved
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_kernel_matches_model_composition(wins_everywhere):
    """The Pallas kernel itself (interpret mode), driven through the exact
    weight layout the model hands it (concatenated qkv)."""
    rng = np.random.default_rng(2)
    d, inner, m = 128, 128, 256
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, (d,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (d,)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((d, inner)) * d ** -0.5,
                      jnp.float32) for _ in range(3)]
    w = jnp.concatenate(ws, axis=1)
    got = LL.ln_linear(x, g, b, w, None, 1e-5, None, None, True)
    want = LL.ln_linear_reference(x, g, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
