"""Cross-attention SpatialTransformer stack (Stable Diffusion's conditioning
path) in Flax, NHWC, TPU-first.

Behavioral twin of examples/stable-diffusion/ldm/modules/attention.py:
CrossAttention (:152-195), GEGLU/FeedForward (:37-65),
BasicTransformerBlock (:196-215), SpatialTransformer (:218-261).

TPU-first: attention runs as batched head-major einsums (B, T, H, D) feeding
the MXU — no (b*h) reshape round-trips — with fp32 softmax for bf16 safety;
the q/k/v projections of *self*-attention fuse into one matmul when the
context is the token stream itself.

Kernel wiring (per-site, measured on v5e — results_geglu_v5e.json,
results_ln_linear_v5e.json): TransformerBlock owns the pre-LN params and
hands raw tokens plus (scale, bias) to each sub-module, so every LN->proj
pair can route through the fused Pallas ln_linear kernel where its A/B won
and through the plain XLA composition elsewhere — with a checkpoint tree
identical to the LayerNorm/Dense modules it replaces. The dispatch is
static (token count and width are trace-time constants).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Ln = Optional[Tuple[jax.Array, jax.Array]]


class _LNParams(nn.Module):
    """Declares nn.LayerNorm-shaped (scale, bias) without normalizing, so
    the owning block can fuse the LN into a downstream matmul while the
    param tree stays identical to nn.LayerNorm(name=...)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _Kernel(nn.Module):
    """Declares an nn.Dense(use_bias=False)-shaped kernel without running
    the matmul (param tree identical to nn.Dense(name=...))."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features))


def _ln(x, ln, dtype):
    from dpm_solver_tpu.ops.ln_linear import layer_norm_fp32

    return layer_norm_fp32(x, ln[0], ln[1]).astype(dtype)


class CrossAttention(nn.Module):
    """Multi-head attention; keys/values from `context` (defaults to self).

    Params mirror the reference: to_q/to_k/to_v are bias-free, the output
    projection has a bias (attention.py:161-168).

    When the caller passes `ln=(scale, bias)`, x arrives UN-normalized and
    this module applies the pre-LN itself — fused into the q/qkv projection
    via ops/ln_linear.py at shapes where the kernel's A/B won, as the XLA
    composition elsewhere. `context` is never layer-normed (attention.py:206
    norms only the query stream).
    """

    heads: int
    dim_head: int
    out_dim: Optional[int] = None
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None, ln: Ln = None):
        from dpm_solver_tpu.ops.ln_linear import ln_linear, ln_linear_site_wins
        from dpm_solver_tpu.ops.quant import dense as make_dense

        b, t, q_dim = x.shape
        inner = self.heads * self.dim_head
        dense = lambda d, name: make_dense(self.quant, d, use_bias=False,
                                           dtype=self.dtype, name=name)
        if ln is None:
            xn = x
        elif self.quant is None:
            # own the pre-LN; fuse it into the projection where measured
            site = "qkv" if context is None else "q_cross"
            n_out = 3 * inner if context is None else inner
            if ln_linear_site_wins(site, b * t, q_dim, n_out):
                ws = [_Kernel(q_dim, inner, name=nm)()
                      for nm in (("to_q", "to_k", "to_v") if context is None
                                 else ("to_q",))]
                w = (jnp.concatenate(ws, axis=1) if len(ws) > 1
                     else ws[0]).astype(self.dtype)
                fused = ln_linear(x.astype(self.dtype), ln[0], ln[1], w)
                if context is None:
                    q, k, v = jnp.split(fused, 3, axis=-1)
                else:
                    q = fused
                    k = dense(inner, "to_k")(context.astype(self.dtype))
                    v = dense(inner, "to_v")(context.astype(self.dtype))
                from dpm_solver_tpu.ops.attention import token_attention

                out = token_attention(q, k, v, num_heads=self.heads,
                                      scale=self.dim_head ** -0.5)
                return make_dense(self.quant, self.out_dim or q_dim,
                                  dtype=self.dtype, name="to_out")(out)
            xn = _ln(x, ln, self.dtype)
        else:
            xn = _ln(x, ln, self.dtype)
        ctx = xn if context is None else context
        if context is None:
            # self-attention: one fused (C, 3*inner) matmul
            qkv = jnp.concatenate(
                [dense(inner, n)(xn) for n in ("to_q", "to_k", "to_v")], -1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(inner, "to_q")(xn)
            k = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)
        from dpm_solver_tpu.ops.attention import token_attention

        out = token_attention(q, k, v, num_heads=self.heads,
                              scale=self.dim_head ** -0.5)
        return make_dense(self.quant, self.out_dim or q_dim, dtype=self.dtype,
                          name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """FeedForward with gated-GELU projection (attention.py:37-65; SD always
    uses glu=True via gated_ff). Routed through the fused Pallas GEGLU
    kernel in regime (ops/geglu.py — the d->8d projection never touches
    HBM); param tree identical to the Dense pair it replaces.

    With `ln=(scale, bias)` the module owns the pre-LN (norm3): applied
    standalone ahead of the GEGLU kernel where that kernel wins, fused into
    the in-projection via ops/ln_linear.py where THAT won, plain XLA
    elsewhere."""

    mult: int = 4
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, ln: Ln = None):
        from dpm_solver_tpu.ops.geglu import (
            _gelu_exact,
            _LinParams,
            geglu_ff,
            geglu_supported,
        )
        from dpm_solver_tpu.ops.ln_linear import ln_linear, ln_linear_site_wins

        dim = x.shape[-1]
        inner = dim * self.mult
        w1, b1 = _LinParams(dim, 2 * inner, name="proj")()
        w2, b2 = _LinParams(inner, dim, name="out")()
        from dpm_solver_tpu.ops.quant import wants_dense_quant

        if wants_dense_quant(self.quant):
            from dpm_solver_tpu.ops.quant import w8a8_geglu

            xn = x if ln is None else _ln(x, ln, self.dtype)
            return w8a8_geglu(xn.astype(self.dtype), w1, b1, w2, b2)
        m = 1
        for s in x.shape[:-1]:
            m *= s
        if (ln is not None and not geglu_supported(m, dim, inner)
                and ln_linear_site_wins("ff_in", m, dim, 2 * inner)):
            # LN fused into the in-projection; gate + down-proj in XLA
            # (numerics of geglu._ref_impl: fp32 gate math, dtype cast)
            h = ln_linear(x.astype(self.dtype), ln[0], ln[1],
                          w1.astype(self.dtype), b1)
            h, gate = jnp.split(h.astype(jnp.float32), 2, axis=-1)
            hg = (h * _gelu_exact(gate)).astype(self.dtype)
            return (jnp.dot(hg, w2.astype(self.dtype),
                            preferred_element_type=jnp.float32)
                    + b2).astype(self.dtype)
        xn = x if ln is None else _ln(x, ln, self.dtype)
        return geglu_ff(xn.astype(self.dtype), w1, b1, w2, b2)


class TransformerBlock(nn.Module):
    """Pre-LayerNorm: self-attn -> cross-attn(context) -> GEGLU MLP
    (BasicTransformerBlock, attention.py:196-215). Owns the three LN param
    pairs (tree-identical to nn.LayerNorm) and delegates their application
    to the sub-modules so each LN->proj pair can fuse per the measured
    tables."""

    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None):
        d = x.shape[-1]
        attn = lambda name: CrossAttention(self.heads, self.dim_head,
                                           dtype=self.dtype, quant=self.quant,
                                           name=name)
        x = x + attn("attn1")(x, ln=_LNParams(d, name="norm1")())
        x = x + attn("attn2")(x, context=context,
                              ln=_LNParams(d, name="norm2")())
        x = x + GEGLUFeedForward(dtype=self.dtype, quant=self.quant,
                                 name="ff")(x, ln=_LNParams(d, name="norm3")())
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> transformer over HW tokens -> zero-init out
    proj, residual (attention.py:218-261). NHWC in/out.

    `linear_proj` uses token-space Linear projections instead of 1x1 convs —
    the SD-2.x `use_linear_in_transformer` variant (math-identical; the
    checkpoint weight ranks differ)."""

    heads: int
    dim_head: int
    depth: int = 1
    linear_proj: bool = False
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None):
        from dpm_solver_tpu.ops.quant import dense as make_dense

        b, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32)).astype(x.dtype)
        if self.linear_proj:
            h = h.reshape(b, hh * ww, c)
            h = make_dense(self.quant, inner, dtype=self.dtype,
                           name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(b, hh * ww, inner)
        for d in range(self.depth):
            h = TransformerBlock(self.heads, self.dim_head, dtype=self.dtype,
                                 quant=self.quant,
                                 name=f"block_{d}")(h, context=context)
        if self.linear_proj:
            h = nn.Dense(c, kernel_init=jax.nn.initializers.zeros,
                         dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = h.reshape(b, hh, ww, inner)
            h = nn.Conv(c, (1, 1), kernel_init=jax.nn.initializers.zeros,
                        dtype=self.dtype, name="proj_out")(h)
        return x + h
