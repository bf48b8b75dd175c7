"""Fused GEGLU feed-forward kernel (`ops/geglu.py`).

Kernel correctness in interpret mode on small forced shapes; VJP parity;
dispatch predicate; and the transformer FF module's param-tree
compatibility with the nn.Dense pair it replaced (checkpoint converters
must not notice).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpm_solver_tpu.ops.geglu import _ref_impl, geglu_ff, geglu_supported


def _make(m, d, inner, seed=0):
    rs = np.random.default_rng(seed)
    x = jnp.asarray(rs.standard_normal((m, d)), jnp.float32)
    w1 = jnp.asarray(rs.standard_normal((d, 2 * inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rs.standard_normal((2 * inner,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rs.standard_normal((inner, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rs.standard_normal((d,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("shape", [
    (128, 320, 1280),   # SD level-0 width, single inner tile
    (128, 64, 256),     # multi inner tile (ti=128)
    (256, 16, 128),     # tiny d (sublane-aligned only)
])
def test_kernel_matches_ref(shape):
    m, d, inner = shape
    x, w1, b1, w2, b2 = _make(m, d, inner)
    got = geglu_ff(x, w1, b1, w2, b2, True, True)  # force kernel, interpret
    want = _ref_impl(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_kernel_batched_leading_dims():
    x, w1, b1, w2, b2 = _make(256, 64, 256)
    xb = x.reshape(2, 128, 64)
    got = geglu_ff(xb, w1, b1, w2, b2, True, True)
    want = _ref_impl(xb, w1, b1, w2, b2)
    assert got.shape == xb.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_vjp_matches_ref():
    x, w1, b1, w2, b2 = _make(128, 64, 256, seed=1)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal((128, 64)),
                      jnp.float32)

    def loss_k(*a):
        return jnp.sum(geglu_ff(*a, True, True) * cot)

    def loss_r(*a):
        return jnp.sum(_ref_impl(*a) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_dispatch_predicate():
    assert geglu_supported(73728, 320, 1280)   # SD 96px site (1.77x win)
    assert geglu_supported(18432, 640, 2560)   # SD 48px site (1.10x win)
    # SD 24px site measured 0.87x on v5e (results_geglu_v5e.json) — XLA
    assert not geglu_supported(4608, 1280, 5120)
    assert not geglu_supported(616, 320, 1280)    # M with no tile divisor
    assert not geglu_supported(1024, 320, 1280)   # too few rows
    assert not geglu_supported(73728, 320, 1300)  # inner not lane-aligned


def test_ff_module_param_compatible():
    """GEGLUFeedForward keeps the exact proj/out Dense param tree and the
    same fp32 output as the unfused composition."""
    from dpm_solver_tpu.models.transformer import GEGLUFeedForward

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 32)),
                    jnp.float32)

    class Unfused(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(2 * 128, name="proj")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate, approximate=False)
            return nn.Dense(32, name="out")(h)

    ref = Unfused()
    mod = GEGLUFeedForward()
    vr = ref.init(jax.random.PRNGKey(0), x)
    vm = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vm)
    for a, b in zip(jax.tree_util.tree_leaves(vr),
                    jax.tree_util.tree_leaves(vm)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(ref.apply(vr, x)),
                               np.asarray(mod.apply(vm, x)),
                               atol=1e-5, rtol=1e-5)
