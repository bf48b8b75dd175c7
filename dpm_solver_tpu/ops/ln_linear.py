"""Fused LayerNorm -> Linear Pallas kernel for the SD transformer stack.

Motivation: every BasicTransformerBlock site (models/transformer.py:89-95,
twin of examples/stable-diffusion/ldm/modules/attention.py:196-216) computes
`proj(LN(x))` — self-attn qkv (one concatenated d->3d matmul), cross-attn
q, and the FF in-projection. XLA materializes LN(x) (M x d bf16) in HBM
between the reduce and the dot because TPU dots do not take fused operands;
at the SD-2.1 96px site that is a ~47 MB write + read per LN instance per
UNet eval. This kernel normalizes a row tile once into VMEM scratch (fp32
stats, bf16 normalized tile — bit-matching the unfused fp32-LN -> bf16-cast
-> matmul composition) and streams weight column tiles against it, so the
normalized activations never touch HBM.

Wired per-site from the measured on-chip A/B (the repo's discipline; see
ops/fused_update.py for the precedent where a kernel LOST and was retired):
`_SITE_WINS` below holds the winning regimes from
benchmarks/ln_linear_bench.py (results_ln_linear_v5e.json) and
models/transformer.py consults it through `ln_linear_site_wins` —
everything outside those regimes stays on the XLA composition.

Forward-only custom_vjp: the backward composes the XLA LN/matmul VJP
(recompute; sampling is the product, matching ops/geglu.py's convention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm_fp32(x, gamma, beta, *, eps: float = 1e-5):
    """fp32 LayerNorm over the last axis, two-pass variance E[(x-mu)^2]
    (torch.nn.LayerNorm semantics — what the Pallas kernel computes).
    Returns fp32; callers cast."""
    xv = x.astype(jnp.float32)
    mean = jnp.mean(xv, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xv - mean), axis=-1, keepdims=True)
    xn = (xv - mean) * jax.lax.rsqrt(var + eps)
    return xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def ln_linear_reference(x, gamma, beta, w, bias=None, *, eps: float = 1e-5):
    """Unfused composition the kernel must match: fp32 LayerNorm ->
    cast to w.dtype -> matmul (+ bias)."""
    xn = layer_norm_fp32(x, gamma, beta, eps=eps).astype(w.dtype)
    out = jax.lax.dot_general(xn, w, (((xn.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _kernel_core(x_ref, g_ref, b_ref, w_ref, c_ref, o_ref, xn_ref, *,
                 eps: float, out_dtype):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _normalize():
        xv = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xv, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xv - mean), axis=1, keepdims=True)
        xn = (xv - mean) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[...].astype(jnp.float32) \
            + b_ref[...].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)

    out = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if c_ref is not None:
        out = out + c_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(out_dtype)


def _kernel_bias(x_ref, g_ref, b_ref, w_ref, c_ref, o_ref, xn_ref, *,
                 eps, out_dtype):
    _kernel_core(x_ref, g_ref, b_ref, w_ref, c_ref, o_ref, xn_ref,
                 eps=eps, out_dtype=out_dtype)


def _kernel_nobias(x_ref, g_ref, b_ref, w_ref, o_ref, xn_ref, *,
                   eps, out_dtype):
    _kernel_core(x_ref, g_ref, b_ref, w_ref, None, o_ref, xn_ref,
                 eps=eps, out_dtype=out_dtype)


def _fused_call(x2, gamma, beta, w, bias, *, eps, block_m, block_n,
                interpret):
    m, d = x2.shape
    n = w.shape[1]
    grid = (m // block_m, n // block_n)
    in_specs = [
        pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        pl.BlockSpec((d, block_n), lambda i, j: (0, j)),
    ]
    args = [x2, gamma.reshape(1, d), beta.reshape(1, d), w]
    if bias is not None:
        kernel = functools.partial(_kernel_bias, eps=eps,
                                   out_dtype=x2.dtype)
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j: (0, j)))
        args.append(bias.reshape(1, n))
    else:
        kernel = functools.partial(_kernel_nobias, eps=eps,
                                   out_dtype=x2.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), w.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*args)


def _pick_blocks(m: int, d: int, n: int):
    """Largest (block_m, block_n) divisors of (m, n) inside the ~12.5 MB
    scoped-VMEM budget; None when nothing divides. Mosaic requires the
    last block dim to be a lane multiple (128) unless the block spans the
    whole axis (edge block) — so bn candidates are 128-multiples, plus n
    itself (e.g. n=960 at the SD d=320 qkv site runs untiled on n)."""
    bn_cands = [c for c in (1024, 768, 640, 512, 384, 256, 128) if n % c == 0]
    if not bn_cands and n <= 4096:
        bn_cands = [n]  # untiled-n edge block (e.g. n=960: no 128-mult divides)
    best = None
    for bm in (1024, 768, 512, 384, 256, 192, 128, 64):
        if m % bm:
            continue
        for bn in bn_cands:
            vmem = (2 * bm * d * 2 + 2 * d * bn * 2 + bm * d * 2
                    + 4 * d * 4 + 2 * bn * 4 + 2 * bm * bn * 4
                    + bm * d * 4)
            if vmem > 12_500_000:
                continue
            # biggest tile area wins (balanced beats lopsided); break
            # ties toward wider n tiles (weight streaming amortization)
            score = (bm * bn, bn)
            if best is None or score > best[0]:
                best = (score, (bm, bn))
    return best[1] if best else None


def ln_linear_engaged(m: int, d: int, n: int) -> bool:
    """True iff ln_linear(x, ...) with these flattened shapes runs the
    Pallas kernel rather than falling back to the XLA composition."""
    return d % 8 == 0 and _pick_blocks(m, d, n) is not None


# Measured per-(site, shape) wiring verdicts for the SD transformer stack
# (models/transformer.py consults this; benchmarks/ln_linear_bench.py ->
# results_ln_linear_v5e.json is the evidence; engaged=True rows only).
# Discipline: a regime is listed ONLY if it won in both scan-16 v5e runs —
# sub-ms sites swing badly through the tunnel (48px qkv read 1.13x then
# 0.76x), so single-run wins don't wire. Verdicts (2026-08-18):
#   qkv     96px m=73728: 1.30x WIN · 12px m=1152: 1.11x/2.54x WIN ·
#           48px/24px inconsistent-to-losing -> XLA
#   q_cross 0.73-1.00x everywhere -> XLA
#   ff_in   wins only at 96/48px where the GEGLU kernel (results_geglu)
#           already owns the whole FF at 1.27x/1.10x -> never dispatched
_SITE_WINS = {
    # site -> list of (m_lo, m_hi) half-open row-count regimes that won
    "qkv": [(65536, 1 << 60), (1024, 2048)],
    "q_cross": [],
    "ff_in": [],
}


def ln_linear_site_wins(site: str, m: int, d: int, n: int) -> bool:
    """Model-side dispatch: fuse LN into the `site` projection at this
    shape? True only inside a measured-win regime AND where the kernel
    actually engages."""
    if not ln_linear_engaged(m, d, n):
        return False
    return any(lo <= m < hi for lo, hi in _SITE_WINS.get(site, ()))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ln_linear(x, gamma, beta, w, bias=None, eps: float = 1e-5,
              block_m: Optional[int] = None, block_n: Optional[int] = None,
              interpret: bool = False):
    """Fused `LN(x; gamma, beta) @ w (+ bias)` over the last axis of x.

    x: (..., d), w: (d, n) -> (..., n). Tile sizes are auto-picked
    (divisors of m/n within the VMEM budget) unless both block_m/block_n
    are given; falls back to the XLA composition when nothing tiles.
    """
    d = x.shape[-1]
    n = w.shape[1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if block_m and block_n:
        picked = ((block_m, block_n)
                  if m % block_m == 0 and n % block_n == 0 else None)
    else:
        picked = _pick_blocks(m, d, n)
    if (picked is None or d % 8
            or not (interpret or jax.default_backend() == "tpu")):
        return ln_linear_reference(x, gamma, beta, w, bias, eps=eps)
    x2 = x.reshape(m, d)
    out = _fused_call(x2, gamma, beta, w, bias, eps=eps, block_m=picked[0],
                      block_n=picked[1], interpret=interpret)
    return out.reshape(x.shape[:-1] + (n,))


def _fwd(x, gamma, beta, w, bias, eps, block_m, block_n, interpret):
    return (ln_linear(x, gamma, beta, w, bias, eps, block_m, block_n,
                      interpret),
            (x, gamma, beta, w, bias))


def _bwd(eps, block_m, block_n, interpret, res, g):
    x, gamma, beta, w, bias = res
    diff_args = (x, gamma, beta, w) if bias is None \
        else (x, gamma, beta, w, bias)

    def ref(*a):
        if bias is None:
            return ln_linear_reference(a[0], a[1], a[2], a[3], None, eps=eps)
        return ln_linear_reference(*a, eps=eps)

    _, vjp = jax.vjp(ref, *diff_args)
    grads = vjp(g)
    if bias is None:
        grads = grads + (None,)
    return grads


ln_linear.defvjp(_fwd, _bwd)
