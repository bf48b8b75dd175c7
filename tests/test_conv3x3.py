"""Pallas 3x3 slab-conv kernel (`ops/conv3x3.py`) vs XLA's conv.

The kernel targets the large-spatial regime where XLA's TPU conv lowering
stalls (VAE decoder 768px levels; see benchmarks/conv3x3_bench.py for the
measured table). Correctness is checked here in interpret mode on small
shapes with `force=True`; the dispatch predicate and the flax module's
param-compatibility with `nn.Conv` (checkpoint converters must not notice
the swap) are checked structurally.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpm_solver_tpu.ops.conv3x3 import Conv3x3, conv3x3, conv3x3_supported


def _xla_conv(x, w, bias=None):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if bias is None else out + bias


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 128, 128),   # single channel group
    (2, 8, 16, 256, 128),    # multi group in, one out
    (1, 16, 8, 128, 256),    # wider out than in
])
def test_kernel_matches_xla(shape):
    b, h, w, c, co = shape
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.standard_normal((b, h, w, c)), jnp.float32)
    wt = jnp.asarray(rs.standard_normal((3, 3, c, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rs.standard_normal((co,)) * 0.1, jnp.float32)
    got = conv3x3(x, wt, bias, True, True)  # force Pallas, interpret
    want = _xla_conv(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_kernel_vjp_matches_xla():
    rs = np.random.default_rng(1)
    x = jnp.asarray(rs.standard_normal((1, 8, 16, 128)), jnp.float32)
    wt = jnp.asarray(rs.standard_normal((3, 3, 128, 128)) * 0.1, jnp.float32)
    bias = jnp.asarray(rs.standard_normal((128,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rs.standard_normal((1, 8, 16, 128)), jnp.float32)

    def loss_pallas(x, w, b):
        return jnp.sum(conv3x3(x, w, b, True, True) * cot)

    def loss_xla(x, w, b):
        return jnp.sum(_xla_conv(x, w, b) * cot)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, wt, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, wt, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3)


def test_fallback_path_matches_and_differentiates():
    # Out-of-regime (small spatial / odd channels) must silently use XLA.
    rs = np.random.default_rng(2)
    x = jnp.asarray(rs.standard_normal((2, 8, 8, 3)), jnp.float32)
    wt = jnp.asarray(rs.standard_normal((3, 3, 3, 32)) * 0.1, jnp.float32)
    got = conv3x3(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv(x, wt)),
                               atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda x: jnp.sum(conv3x3(x, wt) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_dispatch_predicate():
    # In regime: lane-aligned channels, big spatial.
    assert conv3x3_supported((4, 768, 768, 128), (3, 3, 128, 128))
    assert conv3x3_supported((4, 192, 192, 512), (3, 3, 512, 512))
    # Out: small spatial, odd channels, non-3x3, strideable shapes.
    assert not conv3x3_supported((4, 96, 96, 512), (3, 3, 512, 512))
    assert not conv3x3_supported((4, 768, 768, 64), (3, 3, 64, 128))
    assert not conv3x3_supported((4, 768, 768, 128), (1, 1, 128, 128))


def test_module_param_compatible_with_nn_conv():
    """Same param tree and same output as nn.Conv(features, (3,3), padding=1)
    for identical rng — so checkpoint converters are untouched by the swap."""
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 8, 8, 16)),
                    jnp.float32)
    ref = nn.Conv(32, (3, 3), padding=1)
    mod = Conv3x3(32)
    vr = ref.init(jax.random.PRNGKey(0), x)
    vm = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vm)
    for a, b in zip(jax.tree_util.tree_leaves(vr),
                    jax.tree_util.tree_leaves(vm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(ref.apply(vr, x)),
                               np.asarray(mod.apply(vm, x)),
                               atol=1e-5, rtol=1e-5)
