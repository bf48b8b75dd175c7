"""Fused GEGLU feed-forward Pallas kernel for the SD transformer stack.

Motivation (measured, benchmarks/transformer_profile.py on v5e): the
SpatialTransformer FF is `out((h) * gelu(gate))` where `h|gate = proj(x)`
projects d -> 8d. XLA executes this as two matmuls with the (M, 8d)
projection materialized in HBM between them — at the SD-2.1 96px site
(M = 73728, d = 320) that intermediate is 755 MB of bf16 round-tripped
through HBM, and the whole FF runs at ~47 TF/s actual (7.7 ms) against a
~1.9 ms compute bound. This kernel tiles M and the inner dimension,
keeps the projection tile in VMEM, applies the exact-gelu gate there,
and accumulates the down-projection in an fp32 scratch across inner
tiles — the intermediate never touches HBM.

Reference counterpart: GEGLU/FeedForward in
examples/stable-diffusion/ldm/modules/attention.py:37-65 (SD always
gates with exact gelu via glu=True). The reference relies on cuDNN/cuBLAS
fusion; on TPU the XLA lowering leaves ~3x on the table at the hot shape,
which is why this is a native kernel.

Grid: (M/TM, I/TI) with the inner-tile dimension innermost (sequential on
TPU), so the fp32 accumulator persists across inner tiles and the output
block is written once on the last tile. The x block is indexed only by the
M coordinate, so Pallas fetches it once per M tile, not per inner tile.

Backward falls back to the XLA composition via `jax.vjp` of the reference
implementation (recompute; sampling is the product — the training path
keeps full numerical parity with the unfused form).
"""

from __future__ import annotations

import functools

import flax.linen as _nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    # gelu(approximate=False): x * Phi(x) (attention.py uses torch's exact)
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _erf_kernel(x):
    """erf for inside the Pallas kernel: Mosaic has no erf lowering
    (NotImplementedError on the real chip), so use Abramowitz–Stegun
    7.1.26 (max abs err 1.5e-7 — invisible under the kernel's 1e-4
    parity tolerance and the bf16 output cast)."""
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-x * x))


def _gelu_exact_in_kernel(x):
    return 0.5 * x * (1.0 + _erf_kernel(x * (2.0 ** -0.5)))


def _kernel(x_ref, wh_ref, bh_ref, wg_ref, bg_ref, w2_ref, b2_ref,
            o_ref, acc_ref, *, n_i: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xv = x_ref[...]
    h = jax.lax.dot_general(xv, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(xv, wg_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + bh_ref[...]
    g = g + bg_ref[...]
    hg = (h * _gelu_exact_in_kernel(g)).astype(xv.dtype)
    acc_ref[...] += jax.lax.dot_general(
        hg, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] + b2_ref[...]).astype(o_ref.dtype)


def _vmem_est(tm: int, ti: int, d: int) -> int:
    """Scoped-VMEM bytes: double-buffered inputs/weights, the fp32 h/g/acc
    tiles and the bf16 gated tile."""
    bufs = 2 * (tm * d * 2 + 2 * d * ti * 2 + ti * d * 2 + 2 * 2 * ti * 4
                + 2 * d * 4 + tm * d * 2)
    work = 2 * tm * ti * 4 + tm * ti * 2 + tm * d * 4
    return bufs + work


def _pick_tiles(m: int, d: int, inner: int):
    """(TM, TI) inside the ~12.5 MB scoped-VMEM budget; None if no tiling
    divides the operands."""
    for tm in (1024, 768, 512, 384, 256, 128, 64):
        if m % tm:
            continue
        for ti in (1280, 1024, 768, 640, 512, 384, 256, 128):
            if inner % ti:
                continue
            if _vmem_est(tm, ti, d) <= 12_500_000:
                return tm, ti
    return None


def geglu_supported(m: int, d: int, inner: int) -> bool:
    """Shape regime where the fused kernel applies: lane-aligned inner
    tiles, sublane-aligned d, a divisible M tiling, and enough rows for
    the grid to amortize. The m >= 16384 threshold is the measured
    win/loss boundary (results_geglu_v5e.json, v5e: 1.77x at m=73728,
    1.10x at m=18432, 0.87x at m=4608 — the 24px SD site LOSES and
    must stay on XLA)."""
    return (d % 8 == 0 and inner % 128 == 0 and m >= 16384
            and _pick_tiles(m, d, inner) is not None)


def _geglu_pallas(x2, wh, bh, wg, bg, w2, b2, *, interpret: bool = False):
    m, d = x2.shape
    inner = wh.shape[1]
    tm, ti = _pick_tiles(m, d, inner)
    n_i = inner // ti
    return pl.pallas_call(
        functools.partial(_kernel, n_i=n_i),
        grid=(m // tm, n_i),
        in_specs=[
            pl.BlockSpec((tm, d), lambda mi, ii: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ti), lambda mi, ii: (0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda mi, ii: (0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ti), lambda mi, ii: (0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda mi, ii: (0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, d), lambda mi, ii: (ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda mi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda mi, ii: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x2.dtype),
        scratch_shapes=[pltpu.VMEM((tm, d), jnp.float32)],
        interpret=interpret,
    )(x2, wh, bh, wg, bg, w2, b2)


def _ref_impl(x, w1, b1, w2, b2):
    """XLA composition, numerics-identical to the unfused module
    (fp32 gate math like the kernel's fp32 h/g tiles)."""
    h = (jnp.dot(x, w1.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1)
    h, gate = jnp.split(h, 2, axis=-1)
    hg = (h * _gelu_exact(gate)).astype(x.dtype)
    return (jnp.dot(hg, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32)
            + b2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def geglu_ff(x, w1, b1, w2, b2, force=None, interpret: bool = False):
    """Fused GEGLU feed-forward. x: (..., M rows, d); w1: (d, 2*inner) with
    [h | gate] column halves (attention.py:52-56 split order); b1: (2*inner,);
    w2: (inner, d); b2: (d,)."""
    return _fwd_impl(x, w1, b1, w2, b2, force, interpret)


def _fwd_impl(x, w1, b1, w2, b2, force, interpret):
    d = x.shape[-1]
    inner = w2.shape[0]
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    use = geglu_supported(m, d, inner) if force is None else force
    use = use and (interpret or jax.default_backend() == "tpu")
    if not use:
        return _ref_impl(x, w1, b1, w2, b2)
    x2 = x.reshape(m, d)
    wd = x.dtype
    wh, wg = w1[:, :inner].astype(wd), w1[:, inner:].astype(wd)
    bh, bg = (b1[:inner].reshape(1, inner).astype(jnp.float32),
              b1[inner:].reshape(1, inner).astype(jnp.float32))
    out = _geglu_pallas(x2, wh, bh, wg, bg, w2.astype(wd),
                        b2.reshape(1, d).astype(jnp.float32),
                        interpret=interpret)
    return out.reshape(*lead, d)


def _fwd(x, w1, b1, w2, b2, force, interpret):
    return _fwd_impl(x, w1, b1, w2, b2, force, interpret), (x, w1, b1, w2, b2)


def _bwd(force, interpret, res, g):
    # XLA recompute backward: exact VJP of the reference composition
    _, vjp = jax.vjp(_ref_impl, *res)
    return vjp(g.astype(res[0].dtype))


geglu_ff.defvjp(_fwd, _bwd)


class _LinParams(_nn.Module):
    """Declares an nn.Dense-shaped (kernel, bias) pair without running the
    matmul, so a fused op (models/transformer.py::GEGLUFeedForward) can
    consume the raw params while the checkpoint tree stays identical to
    nn.Dense(name=...)."""

    in_dim: int
    features: int

    @_nn.compact
    def __call__(self):
        k = self.param("kernel", _nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = self.param("bias", _nn.initializers.zeros, (self.features,))
        return k, b
