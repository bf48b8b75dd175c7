"""Pallas attention kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpm_solver_tpu.ops.attention import (
    attention_xla,
    fused_attention,
    token_attention,
)


@pytest.mark.parametrize("shape", [(4, 100, 100, 40), (2, 128, 128, 64),
                                   (3, 130, 77, 160), (1, 257, 64, 32)])
def test_fused_attention_matches_xla(shape):
    bh, t, s, d = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    want = attention_xla(q, k, v)
    got = fused_attention(q, k, v, None, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_token_attention_heads_and_grad():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 77, 80).astype(np.float32))
    o1 = token_attention(q, ctx, ctx, num_heads=4, interpret=True)
    o2 = token_attention(q, ctx, ctx, num_heads=4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=3e-6)

    g1 = jax.grad(lambda u: (fused_attention(u, ctx, ctx, None, 128, True)
                             ** 2).sum())(q)
    g2 = jax.grad(lambda u: (attention_xla(u, ctx, ctx) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_custom_scale():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))
    got = fused_attention(q, q, q, 0.5, 128, True)
    want = attention_xla(q, q, q, scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


@pytest.mark.parametrize("shape,blocks", [
    ((2, 300, 300, 64), (128, 128)),   # padded tail key block
    ((1, 128, 2500, 40), (128, 1024)),  # long-S regime, uneven
    ((3, 70, 70, 160), (128, 256)),     # tiny, fully padded tail
    ((1, 129, 1025, 64), (128, 512)),
])
def test_flash_attention_matches_xla(shape, blocks):
    """Blocked-K streaming kernel (running-max rescaling) is numerically
    exact vs the reference composition across padding regimes."""
    from dpm_solver_tpu.ops.attention import flash_attention

    bh, t, s, d = shape
    bq, bk = blocks
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    want = attention_xla(q, k, v)
    got = flash_attention(q, k, v, None, bq, bk, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


@pytest.mark.parametrize("mxu_rowsum,softmax_bf16", [
    (True, False), (False, True), (True, True)])
@pytest.mark.parametrize("shape", [(2, 256, 256, 64), (1, 129, 1025, 64)])
def test_forward_variants_match_reference(shape, mxu_rowsum, softmax_bf16):
    """The measured forward variants (softmax denominator on MXU output
    lanes via a ones-augmented v; bf16 exp2 after exact f32 max-subtract)
    stay within bf16 tolerance of the reference composition — both kernels,
    padded and unpadded regimes."""
    from dpm_solver_tpu.ops.attention import flash_attention

    bh, t, s, d = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, s, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, s, d), jnp.bfloat16)
    want = np.asarray(attention_xla(q, k, v), np.float32)
    panel = np.asarray(
        fused_attention(q, k, v, None, 128, True, mxu_rowsum, softmax_bf16),
        np.float32)
    flash = np.asarray(
        flash_attention(q, k, v, None, 128, 256, True, mxu_rowsum,
                        softmax_bf16), np.float32)
    np.testing.assert_allclose(panel, want, atol=2e-2)
    np.testing.assert_allclose(flash, want, atol=2e-2)


def test_mxu_rowsum_exact_in_fp32():
    """With fp32 inputs the ones-column denominator is the same sum the VPU
    pass computes — bitwise-equivalent math, so near-exact vs reference."""
    from dpm_solver_tpu.ops.attention import flash_attention

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 130, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 300, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 300, 64).astype(np.float32))
    want = np.asarray(attention_xla(q, k, v))
    got = np.asarray(flash_attention(q, k, v, None, 128, 256, True, True))
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_variant_grad_is_exact_f32_path():
    """Backward ignores the forward variant flags (exact-f32 dq/dk/dv)."""
    from dpm_solver_tpu.ops.attention import flash_attention

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 128, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 160, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 160, 32).astype(np.float32))
    f = lambda q, k, v: flash_attention(q, k, v, None, 128, 128, True,
                                        True, False).sum()
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(lambda q, k, v: attention_xla(q, k, v).sum(),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("concat", [True, False])
@pytest.mark.parametrize("shape", [
    (2, 256, 4, 64, 256),    # even blocks, dh=64 (SD-like)
    (1, 300, 5, 64, 320),    # padded query+key tails, C=320 (96px twin)
    (2, 130, 2, 40, 96),     # dh=40, non-lane-aligned C
])
def test_attention_out_fused_matches_composition(shape, concat):
    """Fused attention->out-proj->residual epilogue matches the unfused
    token_attention -> matmul -> add composition (f32, near-exact)."""
    from dpm_solver_tpu.ops.attention import (
        attention_out_fused,
        attention_out_ref,
    )

    b, t, h, dh, c = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    w = jnp.asarray(rng.randn(h * dh, c).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    res = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    want = attention_out_ref(q, k, v, w, bias, res, num_heads=h)
    got = attention_out_fused(q, k, v, w, bias, res, h, None, True, concat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    # bias=None path
    want0 = attention_out_ref(q, k, v, w, None, res, num_heads=h)
    got0 = attention_out_fused(q, k, v, w, None, res, h, None, True, concat)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               rtol=1e-5, atol=1e-4)


def test_attention_out_fused_grad_matches_composition():
    """Backward is the recompute VJP of the reference composition — every
    input (q/k/v/w/bias/residual) gets the composition's gradient."""
    from dpm_solver_tpu.ops.attention import (
        attention_out_fused,
        attention_out_ref,
    )

    rng = np.random.RandomState(5)
    b, t, h, dh, c = 1, 128, 2, 32, 64
    q = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h * dh).astype(np.float32))
    w = jnp.asarray(rng.randn(h * dh, c).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    res = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    f = lambda *a: (attention_out_fused(*a, h, None, True) ** 2).sum()
    ref = lambda *a: (attention_out_ref(*a, num_heads=h) ** 2).sum()
    g = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, w, bias, res)
    want = jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, w, bias, res)
    for a, b_ in zip(g, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_flash_attention_grad_falls_back_to_xla():
    from dpm_solver_tpu.ops.attention import flash_attention

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 64, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 96, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 96, 32).astype(np.float32))
    f = lambda q, k, v: flash_attention(q, k, v, None, 64, 64, True).sum()
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(lambda q, k, v: attention_xla(q, k, v).sum(),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("shape,blocks", [
    ((2, 300, 300, 64), (128, 128)),    # padded tail key block
    ((1, 256, 2500, 64), (256, 1024)),  # long-S regime, uneven
    ((1, 129, 1025, 64), (128, 512)),   # both dims padded
    ((2, 512, 512, 40), (256, 256)),    # non-64 head dim
])
def test_flash_attention_t_matches_xla(shape, blocks):
    """Transposed-product streaming kernel (_flash_kernel_T: logits^T
    space, acc^T = V^T P^T full-fill matmul) is numerically exact vs the
    reference composition across padding regimes."""
    from dpm_solver_tpu.ops.attention import flash_attention_t

    bh, t, s, d = shape
    bq, bk = blocks
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    want = attention_xla(q, k, v)
    got = flash_attention_t(q, k, v, None, bq, bk, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_flash_attention_t_grad_matches_flash():
    """flash_attention_t's vjp (normal-layout residuals through
    _mha_backward) matches flash_attention's and the XLA composition's."""
    from dpm_solver_tpu.ops.attention import (flash_attention,
                                              flash_attention_t)

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 300, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 300, 64).astype(np.float32))

    def loss_t(q, k, v):
        return jnp.sum(flash_attention_t(q, k, v, None, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    def loss_f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128, True) ** 2)

    gt = jax.grad(loss_t, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    gf = jax.grad(loss_f, (0, 1, 2))(q, k, v)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(gt, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("shape,bq", [
    ((2, 300, 300, 64), 128),     # padded keys (rows in logits^T)
    ((1, 768, 768, 64), 256),
    ((2, 512, 512, 40), 256),     # non-64 head dim
    ((1, 129, 1025, 64), 128),    # cross-length, both padded
])
def test_fused_attention_t_matches_xla(shape, bq):
    """Transposed full-panel kernel (_panel_kernel_T) is numerically exact
    vs the reference composition across padding regimes."""
    from dpm_solver_tpu.ops.attention import fused_attention_t

    bh, t, s, d = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    want = attention_xla(q, k, v)
    got = fused_attention_t(q, k, v, None, bq, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_fused_attention_t_grad_matches_reference():
    """fused_attention_t's vjp (lse side pass + flash backward) matches
    the XLA composition's gradients."""
    from dpm_solver_tpu.ops.attention import fused_attention_t

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 300, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 300, 64).astype(np.float32))

    def loss_t(q, k, v):
        return jnp.sum(fused_attention_t(q, k, v, None, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    gt = jax.grad(loss_t, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
