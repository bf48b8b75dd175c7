"""Cross-attention SpatialTransformer stack (Stable Diffusion's conditioning
path) in Flax, NHWC, TPU-first.

Behavioral twin of examples/stable-diffusion/ldm/modules/attention.py:
CrossAttention (:152-195), GEGLU/FeedForward (:37-65),
BasicTransformerBlock (:196-215), SpatialTransformer (:218-261).

TPU-first: attention runs as batched head-major einsums (B, T, H, D) feeding
the MXU — no (b*h) reshape round-trips — with fp32 softmax for bf16 safety;
the q/k/v projections of *self*-attention fuse into one matmul when the
context is the token stream itself.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class CrossAttention(nn.Module):
    """Multi-head attention; keys/values from `context` (defaults to self).

    Params mirror the reference: to_q/to_k/to_v are bias-free, the output
    projection has a bias (attention.py:161-168).
    """

    heads: int
    dim_head: int
    out_dim: Optional[int] = None
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None):
        from dpm_solver_tpu.ops.quant import dense as make_dense

        b, t, q_dim = x.shape
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        dense = lambda d, name: make_dense(self.quant, d, use_bias=False,
                                           dtype=self.dtype, name=name)
        if context is None:
            # self-attention: one fused (C, 3*inner) matmul
            qkv = jnp.concatenate(
                [dense(inner, n)(x) for n in ("to_q", "to_k", "to_v")], -1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(inner, "to_q")(x)
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
    HBM); param tree identical to the Dense pair it replaces."""

    mult: int = 4
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from dpm_solver_tpu.ops.geglu import _LinParams, geglu_ff

        dim = x.shape[-1]
        inner = dim * self.mult
        w1, b1 = _LinParams(dim, 2 * inner, name="proj")()
        w2, b2 = _LinParams(inner, dim, name="out")()
        from dpm_solver_tpu.ops.quant import wants_dense_quant

        if wants_dense_quant(self.quant):
            from dpm_solver_tpu.ops.quant import w8a8_geglu

            return w8a8_geglu(x.astype(self.dtype), w1, b1, w2, b2)
        return geglu_ff(x.astype(self.dtype), w1, b1, w2, b2)


class TransformerBlock(nn.Module):
    """Pre-LayerNorm: self-attn -> cross-attn(context) -> GEGLU MLP
    (BasicTransformerBlock, attention.py:196-215)."""

    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        attn = lambda name: CrossAttention(self.heads, self.dim_head,
                                           dtype=self.dtype, quant=self.quant,
                                           name=name)
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context=context)
        x = x + GEGLUFeedForward(dtype=self.dtype, quant=self.quant,
                                 name="ff")(ln("norm3")(x))
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
