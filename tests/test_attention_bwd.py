"""Grad parity for the Pallas flash-style attention backward
(ops/attention.py::_mha_backward): dq/dk/dv from the recompute-free kernel
pair must match the XLA composition's VJP, including ragged block tails and
short-key cross-attention. Interpret mode (CPU); the TPU compile path is
exercised by the kernel benchmarks on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.ops.attention import (
    attention_xla,
    flash_attention,
    fused_attention,
)


@pytest.mark.parametrize("bh,t,s,d", [
    (2, 200, 200, 64),   # ragged query/key tails vs 128-blocks
    (2, 300, 77, 32),    # cross-attention: short keys (SD text context)
])
@pytest.mark.parametrize("which", ["panel", "flash"])
def test_attention_backward_matches_xla(bh, t, s, d, which):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)

    ref = jax.grad(lambda *a: jnp.sum(attention_xla(*a) * g),
                   argnums=(0, 1, 2))(q, k, v)
    if which == "panel":
        fn = lambda *a: jnp.sum(fused_attention(*a, None, 128, True) * g)
    else:
        fn = lambda *a: jnp.sum(flash_attention(*a, None, 128, 128, True) * g)
    got = jax.grad(fn, argnums=(0, 1, 2))(q, k, v)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)


def test_attention_backward_bf16():
    rng = np.random.default_rng(1)
    bh, t, s, d = 2, 256, 256, 64
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.bfloat16)

    ref = jax.grad(lambda *a: jnp.sum(
        attention_xla(*a).astype(jnp.float32) * g.astype(jnp.float32)),
        argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(lambda *a: jnp.sum(
        fused_attention(*a, None, 128, True).astype(jnp.float32)
        * g.astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=0.05, rtol=0.05)
