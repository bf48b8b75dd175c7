"""Dynamic int8 (W8A8) matmul path for serving.

TPU v5e executes s8 x s8 -> s32 on the MXU at 2x the bf16 peak (394 vs 197
TOPS), so matmul-bound stacks (the SD SpatialTransformer projections and
GEGLU feed-forward) can nearly double when both operands are int8.  This
module implements the standard dynamic-quantization recipe:

  * weights:      per-output-channel symmetric absmax scales,
  * activations:  per-token (row) symmetric absmax scales computed on the
                  fly inside the program (no calibration data needed),
  * accumulation: int32 on the MXU, rescaled in fp32, returned in the
                  caller's compute dtype.

Design notes (TPU-first):
  - Weights stay bf16/fp32 in the param tree and are quantized *inside* the
    jitted program: one elementwise pass over W per evaluation (~3 ms for
    the whole 866M-param SD-2.1 UNet at HBM speed) buys unchanged
    checkpoints, converters, shardings, and param trees.  XLA fuses the
    quantize into the surrounding program.
  - No Pallas needed: XLA lowers int8 `dot_general` with
    `preferred_element_type=int32` onto the MXU int8 path directly.

The reference has no quantized path anywhere (its serving story is fp16
autocast, examples/stable-diffusion/scripts/txt2img.py:254,289); this is a
beyond-parity serving feature.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

QUANT_MODES = (None, "w8a8", "w8a8_conv")
# "w8a8": transformer projections + GEGLU FF only.
# "w8a8_conv": additionally the 3x3 conv trunk (per-tensor activation
#              scales there — conv outputs mix spatial positions, so
#              per-token scales cannot factor out).

def wants_dense_quant(mode) -> bool:
    return mode in ("w8a8", "w8a8_conv")


def wants_conv_quant(mode) -> bool:
    return mode == "w8a8_conv"


def _absmax_scale(x: jnp.ndarray, axis, eps: float = 1e-12) -> jnp.ndarray:
    """Symmetric absmax scale along `axis` (kept dims), safe for all-zero
    slices."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.where(amax > eps, amax / 127.0, 1.0)


def quantize(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with absmax scales along `axis`."""
    scale = _absmax_scale(x, axis)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def w8a8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype: Any = None) -> jnp.ndarray:
    """(..., K) @ (K, N) with per-row activation / per-column weight int8.

    Exact for integer-valued operands within [-127, 127] (the unit test
    exploits this); for real activations the per-token scales bound the
    relative quantization noise to ~1%.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    xq, sx = quantize(x2, axis=1)            # sx: (M, 1)
    wq, sw = quantize(w, axis=0)             # sw: (1, N)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(*lead, w.shape[1]).astype(out_dtype)


def w8a8_conv(x: jnp.ndarray, w: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              strides=(1, 1), padding=((1, 1), (1, 1)),
              out_dtype: Any = None) -> jnp.ndarray:
    """NHWC x HWIO conv with per-tensor activation / per-out-channel weight
    int8 scales, int32 MXU accumulation.  Zero-initialized kernels stay
    bit-exact (all-zero channels quantize to 0 with the guarded scale)."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize(x, axis=(1, 2, 3))        # per-image tensor scale
    wq, sw = quantize(w, axis=(0, 1, 2))        # (1,1,1,CO)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx.reshape(-1, 1, 1, 1)
                                     * sw.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def w8a8_geglu(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
               w2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Quantized twin of ops/geglu.py::geglu_ff (same [h | gate] column
    split): both projections run W8A8; the gate stays exact-gelu in fp32."""
    from dpm_solver_tpu.ops.geglu import _gelu_exact

    inner = w2.shape[0]
    up = w8a8_matmul(x, w1, b1, out_dtype=jnp.float32)
    h, gate = up[..., :inner], up[..., inner:]
    hg = (h * _gelu_exact(gate)).astype(x.dtype)
    return w8a8_matmul(hg, w2, b2, out_dtype=x.dtype)


class QuantDense(nn.Module):
    """Drop-in for `nn.Dense` with the W8A8 dynamic path.

    Parameter tree (names, shapes, init) is identical to nn.Dense, so
    converted torch checkpoints and TP shardings apply unchanged; only the
    apply-time compute differs.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return w8a8_matmul(x, kernel, bias, out_dtype=self.dtype)


def dense(quant: Optional[str], features: int, *, use_bias: bool = True,
          dtype: Any = jnp.float32, name: str,
          kernel_init=None) -> nn.Module:
    """nn.Dense or its quantized twin, switched by the static `quant` mode.

    Zero-initialized projections (`kernel_init` given) stay un-quantized:
    their weights are exactly representable either way but the reference
    uses them as residual gates where bit-exact zero output at init matters.
    """
    if quant not in QUANT_MODES:
        raise ValueError(f"Unknown quant mode {quant!r}; one of {QUANT_MODES}")
    if wants_dense_quant(quant) and kernel_init is None:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    kwargs = dict(kernel_init=kernel_init) if kernel_init is not None else {}
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name,
                    **kwargs)
