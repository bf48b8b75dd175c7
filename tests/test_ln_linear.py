"""Fused LayerNorm->Linear kernel vs the unfused XLA composition.

CPU interpret-mode parity (the on-chip A/B lives in
benchmarks/ln_linear_bench.py; the kernel stays unwired from the model
until that measurement exists, per the repo's A/B discipline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.ops.ln_linear import ln_linear, ln_linear_reference


def _data(m, d, n, dtype, seed=0, bias=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (m, d)), dtype)
    gamma = jnp.asarray(rng.normal(1, 0.2, (d,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.2, (d,)), jnp.float32)
    w = jnp.asarray(rng.normal(0, d ** -0.5, (d, n)), dtype)
    c = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32) if bias else None
    return x, gamma, beta, w, c


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype, bias):
    x, g, b, w, c = _data(256, 128, 512, dtype, bias=bias)
    want = ln_linear_reference(x, g, b, w, c)
    got = ln_linear(x, g, b, w, c, 1e-5, 128, 256, True)  # interpret
    tol = 5e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_batched_leading_dims_and_fallback():
    x, g, b, w, c = _data(8 * 64, 128, 256, jnp.float32)
    x3 = x.reshape(8, 64, 128)
    got = ln_linear(x3, g, b, w, c, 1e-5, 128, 256, True)
    want = ln_linear_reference(x3, g, b, w, c)
    assert got.shape == (8, 64, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # ragged row count -> silent XLA fallback, same numbers
    xr = x3[:, :37]
    np.testing.assert_allclose(
        np.asarray(ln_linear(xr, g, b, w, c, 1e-5, 128, 256, True)),
        np.asarray(ln_linear_reference(xr, g, b, w, c)),
        rtol=1e-5, atol=1e-5)


def test_gradients_match_unfused():
    x, g, b, w, c = _data(128, 128, 128, jnp.float32, seed=1)

    def loss_fused(x, g, b, w, c):
        return jnp.sum(jnp.square(
            ln_linear(x, g, b, w, c, 1e-5, 128, 128, True)))

    def loss_ref(x, g, b, w, c):
        return jnp.sum(jnp.square(ln_linear_reference(x, g, b, w, c)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, b, w, c)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, w, c)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=2e-5)
