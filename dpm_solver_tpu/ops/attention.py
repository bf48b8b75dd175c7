"""Pallas TPU attention kernel for the sampling hot path.

The SD UNet's self-attention runs over <= 4096 latent tokens with head dims
40-160 (SURVEY.md §5: the one sequence-scaling lever worth adding). XLA's
default lowering materializes the (T, T) logits in HBM between the two
matmuls; this kernel keeps each query block's logits, softmax, and weighted
sum entirely in VMEM — one HBM read of q/k/v and one write of the output.

Two kernels share the dispatch (`token_attention`): the FULL-PANEL kernel
holds one (block_q, D) query tile plus the full (S, D) key/value panels and
a (block_q, S) logits tile in VMEM (~7 MB at S=4096, D=160) with
numerically exact single-pass softmax; beyond the VMEM budget the
STREAMED (blocked-K flash) kernel takes over with running max/sum
rescaling and O(block_q * block_k) VMEM — it carries SD-2.1@768px's
9216-token self-attention at ~52 TF/s (1.9x the XLA lowering on v5e).
Short sequences (S < 1024) measured faster on plain XLA and stay there.

Differentiable: the backward recomputes through the XLA composition (the
solver's sampling path never differentiates attention; training does, at
standard XLA speed).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 128


def panel_fits_vmem(s: int, dh: int) -> bool:
    """Whether the full-panel kernel's K/V + logits regime fits the VMEM
    budget (the dispatch and benchmarks share this constant)."""
    return (s + (-s % _BLOCK_Q)) * max(dh, 128) * 4 * 2 < 8_000_000


def panel_block_q(t: int) -> int:
    """Full-panel query tile (v5e sweep at (80, 2304, 64): bq=256 edges
    out 128 once the query dim is long enough to tile)."""
    return 256 if t >= 2048 else _BLOCK_Q


def flash_block_q(t: int) -> int:
    """Flash query tile (v5e sweep at (40, 9216, 64): large tiles amortize
    the K/V panel loads — 52 TF/s at bq>=512 vs 29 at bq=128)."""
    if t >= 8192:
        return 1024
    if t >= 3072:
        return 512
    if t >= 1024:
        return 256
    return _BLOCK_Q


def attention_xla(q, k, v, *, scale: Optional[float] = None):
    """Reference math: softmax(q k^T * scale) v over (BH, T, D) panels."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_real: int):
    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    t_pad = k.shape[0]
    if t_pad != t_real:  # mask zero-padded keys out of the softmax
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_ids < t_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _forward(q, k, v, scale, block_q, interpret):
    bh, t, d = q.shape
    s = k.shape[1]
    t_pad = -t % block_q
    s_pad = -s % block_q
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, t_real=s),
        grid=(bh, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :t]


_BLOCK_K = 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, s_real: int, block_k: int, nk: int):
    """Streaming (blocked-K) attention step: running max/sum rescaling keeps
    VMEM use constant in S. Scratch m/l/acc persist across the (sequential)
    k grid dimension; out is written on the last k block."""
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if s_real % block_k:  # file has a padded tail block: mask those keys
        base = kidx * block_k
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base
        logits = jnp.where(ids < s_real, logits, -jnp.inf)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # fully-padded tail blocks leave m unchanged; alpha=1, p=0
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new

    @pl.when(kidx == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    bh, t, d = q.shape
    s = k.shape[1]
    t_pad = -t % block_q
    s_pad = -s % block_k
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    nk = ts // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, s_real=s,
                          block_k=block_k, nk=nk),
        grid=(bh, tq // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K,
                    interpret: bool = False):
    """softmax(q k^T * scale) v with O(block_q * block_k) VMEM — covers the
    long-sequence regime the full-panel kernel can't (e.g. SD-2.1 at 768px:
    9216-token self-attention)."""
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _flash_forward(q, k, v, eff, block_q, block_k, interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    return flash_attention(q, k, v, scale, block_q, block_k, interpret), \
        (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    f = lambda q_, k_, v_: attention_xla(q_, k_, v_, scale=scale)
    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = _BLOCK_Q, interpret: bool = False):
    """softmax(q k^T * scale) v with VMEM-resident logits.

    q: (BH, T, D); k, v: (BH, S, D). scale defaults to D^-1/2.
    """
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _forward(q, k, v, eff, block_q, interpret)


def _fwd(q, k, v, scale, block_q, interpret):
    return fused_attention(q, k, v, scale, block_q, interpret), (q, k, v)


def _bwd(scale, block_q, interpret, res, g):
    q, k, v = res
    f = lambda q_, k_, v_: attention_xla(q_, k_, v_, scale=scale)
    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def token_attention(q, k, v, *, num_heads: int, scale: Optional[float] = None,
                    use_pallas: Optional[bool] = None, interpret: bool = False):
    """Head-major convenience wrapper: q (B, T, H*Dh), k/v (B, S, H*Dh) ->
    (B, T, H*Dh). `use_pallas=None` auto-selects the kernel on TPU backends
    when the VMEM regime fits (S*Dh panels), else the XLA composition."""
    b, t, inner = q.shape
    s = k.shape[1]
    dh = inner // num_heads

    def split(u, length):
        return (u.reshape(b, length, num_heads, dh)
                .transpose(0, 2, 1, 3).reshape(b * num_heads, length, dh))

    qh, kh, vh = split(q, t), split(k, s), split(v, s)
    # full-panel kernel only when the whole (S, dh) K/V + (block_q, S)
    # logits regime fits VMEM; beyond that the streamed kernel takes over
    fits = panel_fits_vmem(s, dh)
    if use_pallas is None:
        # measured on v5e (bf16, device-side-scalar sync): pallas is
        # 1.2-1.9x XLA whenever the key length makes the logits panel wide
        # (self-attention S >= 1024, any dh 40-160); XLA wins for short
        # sequences — at T=S=256 pallas measured 0.6-1.2x across dh 128-512
        # (grid too small to amortize per-program overhead) and for
        # short-key cross-attention (S=77)
        use_pallas = jax.default_backend() == "tpu" and s >= 1024
    if use_pallas or interpret:
        if fits:
            out = fused_attention(qh, kh, vh, scale, panel_block_q(t),
                                  interpret)
        else:
            # long-S regime (SD@768px: S=9216): streamed blocked-K kernel
            out = flash_attention(qh, kh, vh, scale, flash_block_q(t),
                                  _BLOCK_K, interpret)
    else:
        out = attention_xla(qh, kh, vh, scale=scale)
    return (out.reshape(b, num_heads, t, dh)
            .transpose(0, 2, 1, 3).reshape(b, t, inner))
