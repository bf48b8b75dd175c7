"""Pallas TPU attention kernel for the sampling hot path.

The SD UNet's self-attention runs over <= 4096 latent tokens with head dims
40-160 (SURVEY.md §5: the one sequence-scaling lever worth adding). XLA's
default lowering materializes the (T, T) logits in HBM between the two
matmuls; this kernel keeps each query block's logits, softmax, and weighted
sum entirely in VMEM — one HBM read of q/k/v and one write of the output.

Four kernels share the dispatch (`token_attention`): the FULL-PANEL kernel
holds one (block_q, D) query tile plus the full (S, D) key/value panels and
a (block_q, S) logits tile in VMEM (~7 MB at S=4096, D=160) with
numerically exact single-pass softmax; beyond the VMEM budget the
STREAMED (blocked-K flash) kernel takes over with running max/sum
rescaling and O(block_q * block_k) VMEM. At dh <= 64 self-attention both
are superseded by their TRANSPOSED-PRODUCT twins (_panel_kernel_T /
_flash_kernel_T): the whole inner loop runs in logits^T space so the P@V
contraction fills all 128x128 MXU cells where the normal orientation
idles half the output lanes — 96.7 TF/s / 1.33x at SD-2.1@768px's
9216-token site (results_dh64_fill_v5e.json; QK^T is provably stuck at
half fill, see the transposed-product header below). Short sequences
(S < 1024) measured faster on plain XLA and stay there.

Differentiable: the backward is a recompute-free FlashAttention-2-style
pair of Pallas kernels (dq streamed over key blocks; dk/dv streamed over
query blocks) fed by the forward's saved output and per-row log-sum-exp —
no (T, T) tensor and no forward recompute in the training path. At dh=64
its three output matmuls are likewise emitted transposed (operand-order
swap, full fill): 1.17-1.22x, 1.89x the XLA VJP
(results_attn_bwd_ab_v5e.json).
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

# Softmax runs in base 2: q is pre-scaled by scale*log2(e) once (an (T, D)
# elementwise op) so the kernels never touch the (T, S) logits with a scale
# multiply and use exp2 — the VPU's native transcendental — instead of exp.
# Mathematically identical: exp2(log2(e)*(z - m)) == exp(z - m).
# Measured on v5e: neutral at the SD hot shapes (fwd 16.12 vs 16.11 ms,
# bwd 51.7 vs 52.3 ms at (40, 9216, 64) — the kernels are MXU-bound, the
# VPU work hides under the matmuls); kept because it strictly removes an
# (T, S)-sized multiply per tile and frees VPU headroom as MXU util rises.
_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def panel_fits_vmem(s: int, dh: int) -> bool:
    """Whether the full-panel kernel's K/V + logits regime fits the VMEM
    budget (the dispatch and benchmarks share this constant)."""
    return (s + (-s % _BLOCK_Q)) * max(dh, 128) * 4 * 2 < 8_000_000


def panel_block_q(t: int, s: Optional[int] = None) -> int:
    """Full-panel query tile. v5e sweep at (80, 2304, 64)
    (results_attn_sweep_v5e.json): within-session ranking is monotone in
    bq — 768: 2.99 ms, 576: 3.04, 384: 3.06, 256: 3.36 — so take the
    largest divisor-friendly tile whose (bq, S) f32 logits block fits
    scoped VMEM; non-divisors pad the query dim, so only exact divisors
    upgrade past the padding-light defaults."""
    s = t if s is None else s
    for bq in (1024, 768, 512, 384, 256):
        if t % bq == 0 and 4 * bq * s <= 8_000_000:
            return bq
    return 256 if t >= 2048 else _BLOCK_Q


def _flash_vmem_est(bq: int, bk: int, d: int) -> int:
    """Rough scoped-VMEM bytes for one flash program: double-buffered
    q/k/v/o blocks (bf16) + f32 acc/m/l scratch + the f32 logits tile."""
    blocks = 2 * (bq * d * 2 + 2 * bk * d * 2 + bq * d * 2)
    scratch = 4 * bq * d + 2 * bq * 128 * 4
    return blocks + scratch + 4 * bq * bk


def flash_block_q(t: int, d: int = 64) -> int:
    """Flash query tile (v5e sweep at (40, 9216, 64): large tiles amortize
    the K/V panel loads — 54 TF/s at bq=1024 vs 29 at bq=128). Large head
    dims shrink the tile until the program fits scoped VMEM: the VAE's
    single 512-wide mid-attention head at 9216 tokens blew the 16 MB limit
    at batch 8 with bq=1024."""
    if t >= 8192:
        bq = 1024
    elif t >= 3072:
        bq = 512
    elif t >= 1024:
        bq = 256
    else:
        bq = _BLOCK_Q
    while bq > _BLOCK_Q and _flash_vmem_est(bq, _BLOCK_K, d) > 12_000_000:
        bq //= 2
    return bq


def attention_xla(q, k, v, *, scale: Optional[float] = None):
    """Reference math: softmax(q k^T * scale) v over (BH, T, D) panels."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int,
            d_out: Optional[int] = None, softmax_bf16: bool = False):
    """Full-panel attention tile. `d_out`/`softmax_bf16` are the same
    measured variants as _flash_kernel's: ones-augmented v puts the softmax
    denominator on idle MXU output lanes; bf16 exp2 halves the VPU
    transcendental bytes (f32 max-subtract kept exact)."""
    q = q_ref[0]  # pre-scaled by scale * log2(e): logits live in base 2
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_pad = k.shape[0]
    if t_pad != t_real:  # mask zero-padded keys out of the softmax
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_ids < t_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    if softmax_bf16:
        p = jnp.exp2((logits - m).astype(v_ref.dtype))
    else:
        p = jnp.exp2(logits - m)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if d_out is not None:
        o_ref[0] = (acc[:, :d_out] / acc[:, d_out:d_out + 1]
                    ).astype(o_ref.dtype)
    else:
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0] = (acc / l).astype(o_ref.dtype)


# --------------------------------------------------------------------------- #
# backward (FlashAttention-2-style recompute-free dq / dk / dv)
#
# Residuals are (q, k, v, o, lse) with lse = m + log(sum exp) per query row,
# emitted by an lse-returning forward pass. delta = rowsum(dO * O) is plain
# elementwise work computed outside the kernels. Two kernels:
#   dq:    grid (BH, nq, nk) — stream K/V blocks per query block
#   dk/dv: grid (BH, nk, nq) — stream Q/dO blocks per key block
# p is rebuilt from logits - lse (no softmax renormalization needed), so no
# forward recompute of the full attention and no (T, T) HBM tensor.
# --------------------------------------------------------------------------- #


def _lse_kernel(q_ref, k_ref, o_ref, *, t_real: int):
    """Per-row base-2 log-sum-exp of the masked logits (full-panel regime;
    q arrives pre-scaled by scale*log2e, so the emitted rows are
    lse2 = log2(sum exp(z)) * log2e — the domain `_bwd_p_ds` consumes).
    Output rows live in a (T, 1) layout: TPU block shapes need the last two
    dims divisible by (8, 128) or equal to the array's — (block_q, 1)
    qualifies where a 2-D (1, block_q) block does not."""
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if k_ref.shape[1] != t_real:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_ids < t_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    l = jnp.sum(jnp.exp2(logits - m), axis=-1, keepdims=True)
    o_ref[0] = m + jnp.log2(l)


def _lse(q, k, scale, block_q, interpret):
    """(BH, T) base-2 log-sum-exp rows (full-panel regime; pads internally)."""
    bh, t, d = q.shape
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % block_q
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    out = pl.pallas_call(
        functools.partial(_lse_kernel, t_real=s),
        grid=(bh, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, 1), jnp.float32),
        interpret=interpret,
    )(q, k)
    return out[:, :t, 0]


def _bwd_p_ds(q, k, v, do, lse, delta, s_real, base_k, block_k):
    """Shared (p, ds) rebuild for both backward kernels (f32 tiles).

    q arrives pre-scaled by scale*log2e and lse in base 2, so p is rebuilt
    with a single exp2 and no per-logit scale multiply. ds here is the
    gradient w.r.t. the *unscaled* logits z = q k^T: the true-scale factors
    are applied once on the small (block, D) outputs at kernel finish
    (dq: ×scale against k; dk: ×ln2 against the pre-scaled q).
    lse/delta arrive as (block_q, 1) columns and broadcast directly."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if s_real is not None:
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base_k
        logits = jnp.where(ids < s_real, logits, -jnp.inf)
    p = jnp.exp2(logits - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    return p, ds


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, scale: float, s_real, block_k: int, nk: int):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _, ds = _bwd_p_ds(q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0],
                      delta_ref[0], s_real, kidx * block_k, block_k)
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kidx == nk - 1)
    def _finish():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _dq_kernel_T(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dqt_ref,
                 acc_ref, *, scale: float, s_real, block_k: int, nk: int):
    """dq with a TRANSPOSED (d, block_q) output: dq^T = K^T ds^T is
    emitted as dot(k, ds) with contraction on the key block (full 128
    sublanes) and bq on the lanes (full) — the normal orientation's
    (bq, d) output idles half the lanes at d=64 (same fix as
    _flash_kernel_T's P@V; see the transposed-product header)."""
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _, ds = _bwd_p_ds(q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0],
                      delta_ref[0], s_real, kidx * block_k, block_k)
    acc_ref[...] += jax.lax.dot_general(
        k_ref[0], ds.astype(k_ref.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kidx == nk - 1)
    def _finish():
        dqt_ref[0] = (acc_ref[...] * scale).astype(dqt_ref.dtype)


def _dkv_kernel_T(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                  dkt_ref, dvt_ref, dk_acc, dv_acc, *,
                  s_real, block_k: int, nq: int):
    """dk/dv with TRANSPOSED (d, block_k) outputs: dv^T = dO^T P as
    dot(do, p) and dk^T = Q^T dS as dot(q, ds), both contracting the
    query block on the sublanes (full) with the key block on the lanes
    (full). Operand-order swap only — inputs keep their normal layout."""
    qidx = pl.program_id(2)
    kidx = pl.program_id(1)

    @pl.when(qidx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # pre-scaled by scale*log2e; dk rescales by ln2 at finish
    do = do_ref[0]
    p, ds = _bwd_p_ds(q, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0],
                      s_real, kidx * block_k, block_k)
    dv_acc[...] += jax.lax.dot_general(
        do, p.astype(do.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[...] += jax.lax.dot_general(
        q, ds.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qidx == nq - 1)
    def _finish():
        dkt_ref[0] = (dk_acc[...] * _LN2).astype(dkt_ref.dtype)
        dvt_ref[0] = dv_acc[...].astype(dvt_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *,
                s_real, block_k: int, nq: int):
    qidx = pl.program_id(2)
    kidx = pl.program_id(1)

    @pl.when(qidx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # pre-scaled by scale*log2e; dk rescales by ln2 at finish
    do = do_ref[0]
    p, ds = _bwd_p_ds(q, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0],
                      s_real, kidx * block_k, block_k)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qidx == nq - 1)
    def _finish():
        # dk = ds^T (q2 / (scale*log2e)) * scale = ds^T q2 * ln2
        dk_ref[0] = (dk_acc[...] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _mha_backward(q, k, v, o, lse, g, scale, block_q, block_k, interpret,
                  t_out: Optional[bool] = None):
    """Flash-style dq/dk/dv. q/o/g: (BH, T, D); k/v: (BH, S, D);
    lse: (BH, T) BASE-2 log-sum-exp over the REAL keys (padded keys were
    masked at forward). q is re-scaled by scale*log2e here to match.
    `t_out` selects the transposed-output kernels (full MXU fill for the
    three output matmuls at d <= 64 — _dq_kernel_T header); None =
    auto (d <= 64, the lane-underfill regime)."""
    bh, t, d = q.shape
    if t_out is None:
        t_out = d == 64  # the hardware-measured regime (attn_bwd_ab)
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % block_k
    pad_t = lambda u: jnp.pad(u, ((0, 0), (0, t_pad), (0, 0))) if t_pad else u
    pad_s = lambda u: jnp.pad(u, ((0, 0), (0, s_pad), (0, 0))) if s_pad else u
    qp, op, gp = pad_t(q), pad_t(o), pad_t(g)
    kp, vp = pad_s(k), pad_s(v)
    tq, ts = t + t_pad, s + s_pad
    nq, nk = tq // block_q, ts // block_k
    # delta = rowsum(dO * O); zero on padded query rows, so padded queries
    # contribute nothing to dk/dv (p * 0 - 0) and their dq rows are sliced.
    # Row vectors travel in a (BH, T, 1) layout — see _lse_kernel.
    delta = jnp.pad(jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=-1), ((0, 0), (0, t_pad)))[..., None]
    lse_p = jnp.pad(lse, ((0, 0), (0, t_pad)))[..., None]
    s_real = s if s_pad else None

    spec_t = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    if t_out:
        dq_spec = pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i),
                               memory_space=pltpu.VMEM)
        dq_shape = jax.ShapeDtypeStruct((bh, d, tq), q.dtype)
        dq_scratch = pltpu.VMEM((d, block_q), jnp.float32)
        dq_body = _dq_kernel_T
    else:
        dq_spec, dq_shape = spec_t, jax.ShapeDtypeStruct((bh, tq, d), q.dtype)
        dq_scratch = pltpu.VMEM((block_q, d), jnp.float32)
        dq_body = _dq_kernel
    dq = pl.pallas_call(
        functools.partial(dq_body, scale=scale, s_real=s_real,
                          block_k=block_k, nk=nk),
        grid=(bh, nq, nk),
        in_specs=[spec_t, spec_s, spec_s, spec_t, spec_row, spec_row],
        out_specs=dq_spec,
        out_shape=dq_shape,
        scratch_shapes=[dq_scratch],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta)
    if t_out:
        dq = jnp.swapaxes(dq, 1, 2)

    # dk/dv: swap the roles — keys on the outer grid dim, queries streamed
    spec_t2 = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    spec_s2 = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    spec_row2 = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    if t_out:
        kv_spec = pl.BlockSpec((1, d, block_k), lambda b, j, i: (b, 0, j),
                               memory_space=pltpu.VMEM)
        kv_shape = [jax.ShapeDtypeStruct((bh, d, ts), k.dtype),
                    jax.ShapeDtypeStruct((bh, d, ts), v.dtype)]
        kv_scratch = [pltpu.VMEM((d, block_k), jnp.float32),
                      pltpu.VMEM((d, block_k), jnp.float32)]
        kv_body = _dkv_kernel_T
    else:
        kv_spec = spec_s2
        kv_shape = [jax.ShapeDtypeStruct((bh, ts, d), k.dtype),
                    jax.ShapeDtypeStruct((bh, ts, d), v.dtype)]
        kv_scratch = [pltpu.VMEM((block_k, d), jnp.float32),
                      pltpu.VMEM((block_k, d), jnp.float32)]
        kv_body = _dkv_kernel
    dk, dv = pl.pallas_call(
        functools.partial(kv_body, s_real=s_real,
                          block_k=block_k, nq=nq),
        grid=(bh, nk, nq),
        in_specs=[spec_t2, spec_s2, spec_s2, spec_t2, spec_row2, spec_row2],
        out_specs=[kv_spec, kv_spec],
        out_shape=kv_shape,
        scratch_shapes=kv_scratch,
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta)
    if t_out:
        dk, dv = jnp.swapaxes(dk, 1, 2), jnp.swapaxes(dv, 1, 2)
    return dq[:, :t], dk[:, :s], dv[:, :s]


def _forward(q, k, v, scale, block_q, interpret,
             mxu_rowsum=False, softmax_bf16=False):
    bh, t, d = q.shape
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % block_q
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    if mxu_rowsum:
        v = jnp.concatenate([v, jnp.ones((bh, s, 1), v.dtype)], axis=-1)
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    dv = d + 1 if mxu_rowsum else d

    out = pl.pallas_call(
        functools.partial(_kernel, t_real=s,
                          d_out=d if mxu_rowsum else None,
                          softmax_bf16=softmax_bf16),
        grid=(bh, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, dv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :t]


_BLOCK_K = 1024


# --------------------------------------------------------------------------- #
# transposed-product streaming kernel (the dh=64 MXU half-fill attack)
#
# At dh=64 both attention matmuls under-fill the 128x128 MXU: QK^T
# contracts over dh (64 of 128 sublanes) and P@V emits dh output lanes
# (64 of 128) — BASELINE.md's roofline halves the attention ceiling to
# ~98 TF/s for it. The two are NOT symmetric:
#
#   QK^T is structurally stuck: its contraction IS dh. Packing two heads
#   block-diagonally ([K0 0; 0 K1], 128-deep) fills the sublanes but
#   computes 2x the raw MACs for 2x the useful work — 50% useful fill
#   again; any single MXU contraction yielding two independent per-head
#   products needs those zero blocks.
#
#   P@V is fixable by computing the product TRANSPOSED: keep the whole
#   inner loop in logits^T space — logits^T = K (bk, dh) @ Q^T (dh, bq)
#   (same half-depth contraction as before, just n<->m swapped), softmax
#   per COLUMN, then acc^T = V^T (dh, bk) @ P^T (bk, bq): contraction bk
#   fills all 128 sublanes and bq fills all 128 lanes — dh=64 moves to
#   the streaming m-dim where it costs pipeline fill, not array fill.
#   The ones-row trick rides along (row dh of V^T = 1 -> acc^T row dh is
#   the softmax denominator on an idle stream slot).
#
# q/v/o travel transposed ((BH, dh, T) panels, one XLA transpose each
# outside the kernel — ~0.35 ms total at the 9216-token SD site vs the
# multi-ms matmul saving if the fill materializes); k keeps its natural
# layout. Measured verdict lives in results_dh64_fill_v5e.json and the
# `_FLASH_T_WINS` gate below.
# --------------------------------------------------------------------------- #


def _flash_kernel_T(qt_ref, k_ref, vt_ref, o_ref, *rest,
                    s_real: int, block_k: int, nk: int, dh: int,
                    softmax_bf16: bool = False):
    """One (query-block, key-block) step in transposed space. qt arrives
    pre-scaled by scale*log2e (base-2 softmax, see _LOG2E). vt carries a
    ones row at index dh (the rowsum-on-MXU denominator, transposed).
    Scratch: m (8, bq) running column max (row 0 live); acc (dh+1, bq)."""
    if len(rest) == 3:
        lse_ref, m_ref, acc_ref = rest
    else:
        m_ref, acc_ref = rest
        lse_ref = None
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # logits^T: (bk, bq) = K (bk, dh) @ Q^T (dh, bq) — contraction dh
    logits = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if s_real % block_k:  # padded tail keys are ROWS here
        base = kidx * block_k
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(ids < s_real, logits, -jnp.inf)

    m_prev = m_ref[:1]
    m_cur = jnp.max(logits, axis=0, keepdims=True)     # (1, bq)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    if softmax_bf16:
        p = jnp.exp2((logits - m_new).astype(vt_ref.dtype))
    else:
        p = jnp.exp2(logits - m_new)
    # acc^T: (dh+1, bq) += V^T (dh+1, bk) @ P^T (bk, bq) — contraction bk
    # on the sublanes (full), bq on the lanes (full): the full-fill matmul
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:1] = m_new

    @pl.when(kidx == nk - 1)
    def _finish():
        l = acc_ref[dh:dh + 1]                          # ones-row denominator
        o_ref[0] = (acc_ref[:dh] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = m_ref[:1] + jnp.log2(l)


def _flash_forward_T(q, k, v, scale, block_q, block_k, interpret,
                     with_lse=False, softmax_bf16=False):
    """Transposed-product streaming forward: q/k/v and the output keep the
    normal (BH, T/S, D) layout at the boundary; q/v/o are transposed
    around the kernel (one fused XLA transpose each)."""
    bh, t, d = q.shape
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % block_k
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    v = jnp.concatenate([v, jnp.ones((bh, s, 1), v.dtype)], axis=-1)
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    nk = ts // block_k
    qt = jnp.swapaxes(q, 1, 2)                      # (BH, dh, Tq)
    vt = jnp.swapaxes(v, 1, 2)                      # (BH, dh+1, Ts)

    spec_qt = pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i),
                           memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    spec_vt = pl.BlockSpec((1, d + 1, block_k), lambda b, i, j: (b, 0, j),
                           memory_space=pltpu.VMEM)
    spec_ot = pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i),
                           memory_space=pltpu.VMEM)
    out_specs = spec_ot
    out_shape = jax.ShapeDtypeStruct((bh, d, tq), q.dtype)
    if with_lse:
        out_specs = [spec_ot,
                     pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_flash_kernel_T, s_real=s, block_k=block_k,
                          nk=nk, dh=d, softmax_bf16=softmax_bf16),
        grid=(bh, tq // block_q, nk),
        in_specs=[spec_qt, spec_k, spec_vt],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, block_q), jnp.float32),
                        pltpu.VMEM((d + 1, block_q), jnp.float32)],
        interpret=interpret,
    )(qt, k, vt)
    if with_lse:
        ot, lse = out
        return jnp.swapaxes(ot, 1, 2)[:, :t], lse[:, 0, :t]
    return jnp.swapaxes(out, 1, 2)[:, :t]


def _panel_kernel_T(qt_ref, k_ref, vt_ref, o_ref, *, t_real: int, dh: int):
    """Full-panel transposed-product tile: whole (S, dh) key panel and
    (dh+1, S) v^T panel in VMEM, logits^T (S, bq) single-pass softmax per
    column, then the full-fill acc^T = V^T P^T contraction (see
    _flash_kernel_T). qt arrives pre-scaled by scale*log2e."""
    qt = qt_ref[0]                                   # (dh, bq)
    k = k_ref[0]                                     # (S_pad, dh)
    logits = jax.lax.dot_general(
        k, qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (S_pad, bq)
    s_pad = k.shape[0]
    if s_pad != t_real:                              # padded keys are rows
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(ids < t_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=0, keepdims=True)       # (1, bq)
    p = jnp.exp2(logits - m)
    acc = jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (dh+1, bq)
    o_ref[0] = (acc[:dh] / acc[dh:dh + 1]).astype(o_ref.dtype)


def _panel_forward_T(q, k, v, scale, block_q, interpret):
    """Full-panel transposed forward (no lse variant — the grad path uses
    the streamed-T or normal-panel forward)."""
    bh, t, d = q.shape
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % 128
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    v = jnp.concatenate([v, jnp.ones((bh, s, 1), v.dtype)], axis=-1)
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    qt = jnp.swapaxes(q, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = pl.pallas_call(
        functools.partial(_panel_kernel_T, t_real=s, dh=d),
        grid=(bh, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d + 1, ts), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, tq), q.dtype),
        interpret=interpret,
    )(qt, k, vt)
    return jnp.swapaxes(out, 1, 2)[:, :t]


def panel_t_block_q(t: int, s: Optional[int] = None) -> int:
    """Query tile for the transposed full-panel kernel: bq is the LANE dim
    of both the (S, bq) logits tile and the (dh+1, bq) output contraction,
    so prefer the largest divisor-friendly tile whose f32 logits panel
    fits scoped VMEM (same budget discipline as panel_block_q)."""
    s = t if s is None else s
    s_pad = s + (-s % 128)
    for bq in (1024, 768, 512, 384, 256):
        if t % bq == 0 and 4 * bq * s_pad <= 8_000_000:
            return bq
    return 256 if t >= 2048 else _BLOCK_Q


def _flash_t_vmem_est(bq: int, bk: int, d: int) -> int:
    """Scoped-VMEM bytes for one transposed-flash program: double-buffered
    qt/k/vt/o blocks (bf16) + f32 m/acc scratch + the f32 logits tile."""
    blocks = 2 * (d * bq * 2 + bk * d * 2 + (d + 1) * bk * 2 + d * bq * 2)
    scratch = 8 * bq * 4 + (d + 1) * bq * 4
    return blocks + scratch + 4 * bq * bk + 2 * bq * bk  # logits + p


def flash_t_block_q(t: int, d: int = 64) -> int:
    """Query tile for the transposed kernel (lanes = bq: keep >= 512 so
    the P^T matmul's lane tiles stay wide; VMEM-capped like flash).
    v5e sweep at (40, 9216, 64) (results_dh64_fill_v5e.json): 1024 -> 93.1
    TF/s, 512 -> 81.9."""
    bq = 1024 if t >= 3072 else (512 if t >= 1024 else 256)
    while bq > 256 and _flash_t_vmem_est(bq, flash_t_block_k(t),
                                         d) > 12_000_000:
        bq //= 2
    return bq


def flash_t_block_k(s: int) -> int:
    """Key block for the transposed kernel: deeper blocks lengthen the
    full-fill P^T contraction — 1536 measured 96.7 TF/s vs 1024's 93.1 at
    S=9216 (results_dh64_fill_v5e.json); only exact divisors upgrade."""
    return 1536 if s >= 8192 and s % 1536 == 0 else _BLOCK_K


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                  s_real: int, block_k: int, nk: int,
                  d_out: Optional[int] = None,
                  softmax_bf16: bool = False):
    """Streaming (blocked-K) attention step: running max/sum rescaling keeps
    VMEM use constant in S. Scratch m/l/acc persist across the (sequential)
    k grid dimension; out is written on the last k block. With a second
    output ref present (grad path) the per-row BASE-2 log-sum-exp is
    emitted too. q arrives pre-scaled by scale*log2e (base-2 softmax).

    `d_out` set means the ROWSUM-ON-MXU variant: v arrives augmented with a
    ones column (…, d_out+1) so the softmax denominator falls out of the
    p@v matmul as column d_out — d=64 leaves half the MXU output lanes
    idle, so the extra column is free and the VPU row-sum pass (plus the
    whole l scratch) disappears. `softmax_bf16` computes exp2 on bf16
    (after the exact f32 max-subtract): half the transcendental bytes and
    no separate p→bf16 cast before the MXU; the ~2^-8-relative logit
    rounding is at the output dtype's own grain (A/B'd + parity-gated,
    results_attn_variants_v5e.json)."""
    mxu_rowsum = d_out is not None
    if len(rest) == 4:
        lse_ref, m_ref, l_ref, acc_ref = rest
    elif len(rest) == 3 and not mxu_rowsum:
        m_ref, l_ref, acc_ref = rest
        lse_ref = None
    elif len(rest) == 3:
        lse_ref, m_ref, acc_ref = rest
        l_ref = None
    else:
        m_ref, acc_ref = rest
        lse_ref = l_ref = None
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        if l_ref is not None:
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if s_real % block_k:  # file has a padded tail block: mask those keys
        base = kidx * block_k
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base
        logits = jnp.where(ids < s_real, logits, -jnp.inf)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # fully-padded tail blocks leave m unchanged; alpha=1, p=0
    alpha = jnp.exp2(m_prev - m_new)
    if softmax_bf16:
        p = jnp.exp2((logits - m_new).astype(v_ref.dtype))
    else:
        p = jnp.exp2(logits - m_new)
    if l_ref is not None:
        l_ref[:, :1] = (l_ref[:, :1] * alpha
                        + jnp.sum(p, axis=-1, keepdims=True))
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new

    @pl.when(kidx == nk - 1)
    def _finish():
        if mxu_rowsum:
            l = acc_ref[:, d_out:d_out + 1]
            o_ref[0] = (acc_ref[:, :d_out] / l).astype(o_ref.dtype)
        else:
            l = l_ref[:, :1]
            o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = m_ref[:, :1] + jnp.log2(l)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                   with_lse=False, mxu_rowsum=False, softmax_bf16=False):
    bh, t, d = q.shape
    s = k.shape[1]
    q = (q * (scale * _LOG2E)).astype(q.dtype)
    t_pad = -t % block_q
    s_pad = -s % block_k
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0)))
    if mxu_rowsum:
        # ones column -> the p@v matmul emits the softmax denominator in
        # column d (free: d<=64 leaves MXU output lanes idle anyway)
        v = jnp.concatenate([v, jnp.ones((bh, s, 1), v.dtype)], axis=-1)
    if s_pad:
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    nk = ts // block_k
    dv = d + 1 if mxu_rowsum else d

    spec_o = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    out_specs, out_shape = spec_o, jax.ShapeDtypeStruct((bh, tq, d), q.dtype)
    if with_lse:
        out_specs = [spec_o,
                     pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bh, tq, 1), jnp.float32)]
    scratch = [pltpu.VMEM((block_q, 128), jnp.float32)]   # running max
    if not mxu_rowsum:
        scratch.append(pltpu.VMEM((block_q, 128), jnp.float32))  # running sum
    scratch.append(pltpu.VMEM((block_q, dv), jnp.float32))  # output acc
    out = pl.pallas_call(
        functools.partial(_flash_kernel, s_real=s,
                          block_k=block_k, nk=nk,
                          d_out=d if mxu_rowsum else None,
                          softmax_bf16=softmax_bf16),
        grid=(bh, tq // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)
    if with_lse:
        return out[0][:, :t], out[1][:, :t, 0]
    return out[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K,
                    interpret: bool = False,
                    mxu_rowsum: bool = False, softmax_bf16: bool = False):
    """softmax(q k^T * scale) v with O(block_q * block_k) VMEM — covers the
    long-sequence regime the full-panel kernel can't (e.g. SD-2.1 at 768px:
    9216-token self-attention). `mxu_rowsum`/`softmax_bf16` select the
    measured forward variants (see _flash_kernel); the backward is the
    exact-f32 path either way."""
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _flash_forward(q, k, v, eff, block_q, block_k, interpret,
                          mxu_rowsum=mxu_rowsum, softmax_bf16=softmax_bf16)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret,
               mxu_rowsum, softmax_bf16):
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    o, lse = _flash_forward(q, k, v, eff, block_q, block_k, interpret,
                            with_lse=True, mxu_rowsum=mxu_rowsum,
                            softmax_bf16=softmax_bf16)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, mxu_rowsum, softmax_bf16,
               res, g):
    q, k, v, o, lse = res
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    return _mha_backward(q, k, v, o, lse, g, eff, block_q,
                         min(block_k, 512), interpret)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_t(q, k, v, scale: Optional[float] = None,
                      block_q: int = 512, block_k: int = _BLOCK_K,
                      interpret: bool = False, softmax_bf16: bool = False):
    """softmax(q k^T * scale) v computed in TRANSPOSED product space (see
    _flash_kernel_T): same (BH, T, D) boundary layout and numerics as
    flash_attention, different MXU fill — the P@V contraction runs 128
    sublanes x 128 lanes full at dh=64 instead of half-lanes. Backward is
    the same recompute-free pair as flash_attention (residuals are saved
    in normal layout)."""
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _flash_forward_T(q, k, v, eff, block_q, block_k, interpret,
                            softmax_bf16=softmax_bf16)


def _flash_t_fwd(q, k, v, scale, block_q, block_k, interpret, softmax_bf16):
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    o, lse = _flash_forward_T(q, k, v, eff, block_q, block_k, interpret,
                              with_lse=True, softmax_bf16=softmax_bf16)
    return o, (q, k, v, o, lse)


def _flash_t_bwd(scale, block_q, block_k, interpret, softmax_bf16, res, g):
    q, k, v, o, lse = res
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    return _mha_backward(q, k, v, o, lse, g, eff, max(block_q, _BLOCK_Q),
                         min(block_k, 512), interpret)


flash_attention_t.defvjp(_flash_t_fwd, _flash_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_t(q, k, v, scale: Optional[float] = None,
                      block_q: int = _BLOCK_Q, interpret: bool = False):
    """Full-panel attention computed in transposed product space (see
    _panel_kernel_T): fused_attention's VMEM-resident-logits regime with
    the P@V contraction at full MXU fill for dh < 128. Backward = the
    recompute-free flash pair fed by an _lse side pass (fused_attention's
    own scheme)."""
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _panel_forward_T(q, k, v, eff, block_q, interpret)


def _fused_t_fwd(q, k, v, scale, block_q, interpret):
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    o = _panel_forward_T(q, k, v, eff, block_q, interpret)
    lse = _lse(q, k, eff, max(block_q, _BLOCK_Q), interpret)
    return o, (q, k, v, o, lse)


def _fused_t_bwd(scale, block_q, interpret, res, g):
    q, k, v, o, lse = res
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    s = k.shape[1]
    block_k = min(_BLOCK_K, s + (-s % _BLOCK_Q))
    return _mha_backward(q, k, v, o, lse, g, eff, max(block_q, _BLOCK_Q),
                         block_k, interpret)


fused_attention_t.defvjp(_fused_t_fwd, _fused_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = _BLOCK_Q, interpret: bool = False,
                    mxu_rowsum: bool = False, softmax_bf16: bool = False):
    """softmax(q k^T * scale) v with VMEM-resident logits.

    q: (BH, T, D); k, v: (BH, S, D). scale defaults to D^-1/2.
    `mxu_rowsum`/`softmax_bf16` select the measured forward variants
    (see _kernel); the backward is the exact-f32 path either way.
    """
    d = q.shape[-1]
    eff = (d ** -0.5) if scale is None else scale
    return _forward(q, k, v, eff, block_q, interpret,
                    mxu_rowsum=mxu_rowsum, softmax_bf16=softmax_bf16)


def _fwd(q, k, v, scale, block_q, interpret, mxu_rowsum, softmax_bf16):
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    o = _forward(q, k, v, eff, block_q, interpret,
                 mxu_rowsum=mxu_rowsum, softmax_bf16=softmax_bf16)
    lse = _lse(q, k, eff, block_q, interpret)
    return o, (q, k, v, o, lse)


def _bwd(scale, block_q, interpret, mxu_rowsum, softmax_bf16, res, g):
    q, k, v, o, lse = res
    eff = (q.shape[-1] ** -0.5) if scale is None else scale
    s = k.shape[1]
    block_k = min(_BLOCK_K, s + (-s % _BLOCK_Q))
    return _mha_backward(q, k, v, o, lse, g, eff, block_q, block_k, interpret)


fused_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# fused attention -> out-projection -> residual (the flash epilogue)
#
# Motivation (benchmarks/matmul_probe.py on v5e): the attention
# out-projection at the SD-2.1 96px site is a [73728, 320] x [320, 320]
# matmul that read 20.7 TF/s standalone — the worst row in the probe table —
# with the [73728, 320] attention output making a full HBM round-trip
# (45 MB write + read) between the flash kernel and the matmul. Since
# concat-heads out-projection is exactly a sum of per-head slices
# (out = sum_h o_h @ W[h*dh:(h+1)*dh, :]), the flash kernel can project
# each head's (block_q, dh) output block while it is still in VMEM and add
# bias + residual in the epilogue, so that tensor never touches HBM.
#
# MEASURED VERDICT (results_attn_out_fused_v5e.json, chain-timed, same
# session, 2026-08-19): LOSS at both SD sites — 0.96x at 96px and
# 0.71-0.76x at 48px, for both epilogue formulations (per-head k=64
# accumulation and pair-packed single k=H*dh contraction). Root cause: the
# standalone probe reading overstated the in-situ cost (in the composed
# program the out-proj+residual runs ~0.2-0.25 ms, near its HBM-bytes
# bound — the probe's chain carry-add inflated it), while the in-kernel
# epilogue serializes underfilled MXU contractions and its extra VMEM
# working set degrades the flash loop's double buffering. The kernel is
# kept, tested, and NOT wired (`_ATTN_OUT_WINS` stays empty) — the
# ops/fused_update.py / int8 retirement precedent.
#
# Reference counterpart: per-block `to_out` + residual in
# examples/stable-diffusion/ldm/modules/attention.py:165-168,205-207.
#
# Grid: (B, nq, H, nk) — k innermost (flash streaming), heads next (the
# out accumulator persists across h; Pallas keeps the revisited output
# block in VMEM until the (b, i) coordinate changes). Rowsum-on-MXU is
# always on here (the ones-augmented v column replaces the l scratch).
# --------------------------------------------------------------------------- #


def _attn_out_kernel(q_ref, k_ref, v_ref, w_ref, b_ref, r_ref, o_ref,
                     m_ref, acc_ref, oacc_ref, pair_ref, *,
                     s_real: int, block_k: int, nk: int, nh: int, dh: int,
                     concat: bool):
    hidx = pl.program_id(2)
    kidx = pl.program_id(3)

    if not concat:
        @pl.when(jnp.logical_and(hidx == 0, kidx == 0))
        def _init_out():
            oacc_ref[...] = jnp.zeros_like(oacc_ref)

    @pl.when(kidx == 0)
    def _init_head():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # pre-scaled by scale*log2e (base-2 softmax)
    k = k_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if s_real % block_k:
        base = kidx * block_k
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + base
        logits = jnp.where(ids < s_real, logits, -jnp.inf)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(logits - m_new)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new

    @pl.when(kidx == nk - 1)
    def _project_head():
        # o_h = acc/l (the ones column is the denominator), cast to the
        # compute dtype exactly like the unfused path casts before to_out
        o_h = (acc_ref[:, :dh] / acc_ref[:, dh:dh + 1]).astype(w_ref.dtype)
        if concat:
            # pack heads into (bq, H*dh) VMEM layout for one full-k
            # out-proj contraction at the end. Mosaic requires lane-dim
            # store offsets provably 128-aligned, so dh=64 heads are
            # buffered in pairs (parity-predicated static slices) and each
            # 128-wide pair lands at a 128-multiple; an odd head count
            # leaves a tail head whose offset (nh-1)*64 is also 128-aligned.
            @pl.when(hidx % 2 == 0)
            def _even():
                pair_ref[:, :dh] = o_h

            @pl.when(hidx % 2 == 1)
            def _odd():
                pair_ref[:, dh:] = o_h
                base = pl.multiple_of((hidx - 1) * dh, 2 * dh)
                oacc_ref[:, pl.ds(base, 2 * dh)] = pair_ref[...]

            if nh % 2:
                @pl.when(hidx == nh - 1)
                def _tail():
                    oacc_ref[:, (nh - 1) * dh:] = o_h
        else:
            oacc_ref[...] += jax.lax.dot_general(
                o_h, w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(hidx == nh - 1, kidx == nk - 1))
    def _finish():
        if concat:
            # concat-heads @ w_out: one MXU pass with k = H*dh
            out = jax.lax.dot_general(
                oacc_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            out = oacc_ref[...]
        out = out + b_ref[...]
        o_ref[0] = (out + r_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_out_blocks(t: int, s: int, nh: int, dh: int, c: int, concat: bool):
    """(block_q, block_k): prefer the panel regime (nk=1, whole-S key
    blocks — what the full-panel kernel taught us wins at S<=~3k) when the
    program fits scoped VMEM, else stream lane-aligned S divisors."""
    bk_cands = [s] if s % 128 == 0 and s <= 3072 else []
    bk_cands += [bk for bk in (1024, 768, 512, 384, 256, 128) if s % bk == 0]
    bk_cands.append(_BLOCK_K)
    for bk in bk_cands:
        for bq in (1024, 768, 512, 384, 256, _BLOCK_Q):
            if bq > t + (-t % _BLOCK_Q):
                continue
            if _attn_out_vmem_est(bq, bk, nh, dh, c, concat) <= 12_000_000:
                return bq, bk
    return _BLOCK_Q, _BLOCK_K


def _attn_out_vmem_est(bq: int, bk: int, nh: int, dh: int, c: int,
                       concat: bool) -> int:
    """Scoped-VMEM bytes: double-buffered q/k/v/w/residual blocks (bf16)
    + f32 m/acc scratch, the o/out accumulator, and the f32 logits tile."""
    blocks = 2 * (bq * dh * 2 + bk * dh * 2 + bk * (dh + 1) * 2
                  + dh * c * 2 + bq * c * 2 + bq * c * 2)
    oacc = nh * bq * dh * 2 if concat else bq * c * 4
    scratch = bq * 128 * 4 + bq * (dh + 1) * 4 + oacc
    return blocks + scratch + 4 * bq * bk


def attention_out_ref(q, k, v, w_out, bias, residual, *, num_heads: int,
                      scale: Optional[float] = None):
    """Unfused composition the kernel must match (and the recompute
    backward): token_attention (Pallas/XLA per shape) -> out-projection
    (+bias) -> residual add, all in the caller's dtype."""
    out = token_attention(q, k, v, num_heads=num_heads, scale=scale)
    proj = jax.lax.dot_general(out, w_out.astype(out.dtype),
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if bias is not None:
        proj = proj + bias.astype(jnp.float32)
    return (proj + residual.astype(jnp.float32)).astype(residual.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def attention_out_fused(q, k, v, w_out, bias, residual, num_heads: int,
                        scale: Optional[float] = None,
                        interpret: bool = False, concat: bool = True):
    """softmax(q k^T * scale) v -> concat heads -> @ w_out (+bias)
    -> + residual, with the attention output never leaving VMEM.

    q: (B, T, H*dh); k/v: (B, S, H*dh); w_out: (H*dh, C); bias: (C,) or
    None; residual: (B, T, C). `concat` selects the epilogue variant:
    True buffers per-head outputs in VMEM and runs one k=H*dh out-proj
    contraction per query block; False accumulates H half-filled k=dh
    matmuls. Backward is the XLA-recompute VJP of `attention_out_ref`
    (sampling is the product; ops/geglu.py precedent).
    """
    return _attn_out_forward(q, k, v, w_out, bias, residual,
                             num_heads=num_heads, scale=scale,
                             interpret=interpret, concat=concat)


def _attn_out_forward(q, k, v, w_out, bias, residual, *, num_heads, scale,
                      interpret, concat=True):
    b, t, inner = q.shape
    s = k.shape[1]
    dh = inner // num_heads
    c = w_out.shape[1]
    eff = (dh ** -0.5) if scale is None else scale

    def heads(u, length):
        return (u.reshape(b, length, num_heads, dh)
                .transpose(0, 2, 1, 3))  # (B, H, L, dh)

    qh = heads((q * (eff * _LOG2E)).astype(q.dtype), t)
    kh = heads(k, s)
    vh = heads(v, s)
    vh = jnp.concatenate([vh, jnp.ones((b, num_heads, s, 1), vh.dtype)], -1)

    block_q, block_k = _attn_out_blocks(t, s, num_heads, dh, c, concat)
    t_pad = -t % block_q
    s_pad = -s % block_k
    if t_pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
        residual = jnp.pad(residual, ((0, 0), (0, t_pad), (0, 0)))
    if s_pad:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    tq, ts = t + t_pad, s + s_pad
    nq, nk = tq // block_q, ts // block_k
    b2 = (jnp.zeros((1, c), jnp.float32) if bias is None
          else bias.reshape(1, c).astype(jnp.float32))
    concat = concat and dh == 64  # pair-packing requires 2*dh == 128 lanes
    if concat:
        w3 = w_out.astype(q.dtype)  # flat (H*dh, C)
        w_spec = pl.BlockSpec((inner, c), lambda b, i, h, j: (0, 0),
                              memory_space=pltpu.VMEM)
        oacc = pltpu.VMEM((block_q, inner), q.dtype)
    else:
        w3 = w_out.reshape(num_heads, dh, c).astype(q.dtype)
        w_spec = pl.BlockSpec((1, dh, c), lambda b, i, h, j: (h, 0, 0),
                              memory_space=pltpu.VMEM)
        oacc = pltpu.VMEM((block_q, c), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_attn_out_kernel, s_real=s, block_k=block_k,
                          nk=nk, nh=num_heads, dh=dh, concat=concat),
        grid=(b, nq, num_heads, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda b, i, h, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dh), lambda b, i, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dh + 1),
                         lambda b, i, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, c), lambda b, i, h, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda b, i, h, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, i, h, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq, c), residual.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),      # running max
            pltpu.VMEM((block_q, dh + 1), jnp.float32),   # per-head o acc
            oacc,                                          # out-proj acc
            pltpu.VMEM((block_q, 2 * dh), q.dtype),        # head-pair buffer
        ],
        interpret=interpret,
    )(qh, kh, vh, w3, b2, residual)
    return out[:, :t]


def _attn_out_fwd(q, k, v, w_out, bias, residual, num_heads, scale,
                  interpret, concat):
    out = _attn_out_forward(q, k, v, w_out, bias, residual,
                            num_heads=num_heads, scale=scale,
                            interpret=interpret, concat=concat)
    return out, (q, k, v, w_out, bias, residual)


def _attn_out_bwd(num_heads, scale, interpret, concat, res, g):
    q, k, v, w_out, bias, residual = res
    if bias is None:
        def ref(q, k, v, w, r):
            return attention_out_ref(q, k, v, w, None, r,
                                     num_heads=num_heads, scale=scale)

        _, vjp = jax.vjp(ref, q, k, v, w_out, residual)
        dq, dk, dv, dw, dr = vjp(g.astype(residual.dtype))
        return dq, dk, dv, dw, None, dr
    _, vjp = jax.vjp(
        lambda q, k, v, w, b, r: attention_out_ref(
            q, k, v, w, b, r, num_heads=num_heads, scale=scale),
        q, k, v, w_out, bias, residual)
    return vjp(g.astype(residual.dtype))


attention_out_fused.defvjp(_attn_out_fwd, _attn_out_bwd)


# Measured per-site wiring verdict (benchmarks/attn_out_fused_bench.py ->
# results_attn_out_fused_v5e.json; the repo's discipline: nothing wires
# without a same-session chain-timed win). Round-4 chip session: the
# kernel LOST at both SD sites (0.96x/0.76x) — table stays empty and the
# unfused composition remains production everywhere.
_ATTN_OUT_WINS: list = []


def attn_out_fused_wins(t: int, s: int, num_heads: int, dh: int,
                        c: int) -> bool:
    """Model-side dispatch: fuse out-proj+residual into the attention
    kernel at this site? True only inside a measured-win regime, on the
    self-attention (T == S) long-sequence path the kernel targets."""
    if jax.default_backend() != "tpu" or t != s or s < 1024 or dh > 64:
        return False
    return any(lo <= t * num_heads * dh < hi for lo, hi in _ATTN_OUT_WINS)


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
        # mxu_rowsum (ones-augmented v: softmax denominator rides the p@v
        # matmul's idle output lanes) measured 1.016x/1.044x at the SD
        # (40,9216,64)/(80,2304,64) sites — both dh=64; gated at the
        # measured dh until other dims are A/B'd (the augmented dh+1 last
        # dim is unmeasured at e.g. dh=40/80; numerics are parity-tested
        # either way, so the gate is perf-only — ADVICE.md r3).
        # softmax_bf16 measured 0.94-0.99x there: dead, stays off.
        # dh <= 64 self-attention runs the TRANSPOSED-product kernels
        # (acc^T = V^T P^T: full MXU fill where the normal orientation
        # idles half the output lanes — _flash_kernel_T header). Measured
        # chain-timed, results_dh64_fill_v5e.json: streamed-T 8.99 vs
        # 11.98 ms (1.33x) at the (40, 9216, 64) SD 96px site; panel-T
        # 1.81 vs 1.87 ms (1.035x) at (80, 2304, 64). Gated at the
        # measured regime (dh <= 64, T == S), rowsum precedent.
        rowsum = dh <= 64
        if fits:
            if dh == 64 and t == s:
                # measured at every pallas-regime edge: 1.035x at 2304
                # (bq768, same-session pair) and 1.13x at 1024 (bq1024,
                # the guided-ADM 32px site: 0.823 vs 0.931 ms) —
                # results_dh64_fill_v5e.json. dh==64 exactly: the dh=40/48
                # sites keep the previously-measured normal kernels until
                # the T layout is hardware-A/B'd there (Mosaic has never
                # compiled the (41, block) sublane panels either)
                out = fused_attention_t(qh, kh, vh, scale,
                                        panel_t_block_q(t, s), interpret)
            else:
                out = fused_attention(qh, kh, vh, scale, panel_block_q(t, s),
                                      interpret, rowsum)
        elif dh == 64 and t == s:
            out = flash_attention_t(qh, kh, vh, scale,
                                    flash_t_block_q(t, dh),
                                    flash_t_block_k(s), interpret)
        else:
            # long-S regime, wide heads or cross-attention: streamed
            # blocked-K kernel in normal orientation
            out = flash_attention(qh, kh, vh, scale, flash_block_q(t, dh),
                                  _BLOCK_K, interpret, rowsum)
    else:
        out = attention_xla(qh, kh, vh, scale=scale)
    return (out.reshape(b, num_heads, t, dh)
            .transpose(0, 2, 1, 3).reshape(b, t, inner))
