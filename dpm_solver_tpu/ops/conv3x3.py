"""Pallas TPU 3x3 stride-1 SAME conv for the big-spatial regime where XLA's
conv lowering stalls.

Measured on v5e (bf16, batch 4): XLA's `conv_general_dilated` runs the VAE
decoder's 768px levels at 31-44 TF/s — 4-6x off the bf16 roofline — while
the same network's 96px/512ch convs reach 150+ TF/s. The stall is specific
to large H*W: XLA picks a spatial tiling whose halo re-reads and small K
panels starve the MXU. This kernel streams full-width row slabs through
VMEM, assembles the 3x3 taps as three K=3*128 matmuls per vertical tap
(dx via in-VMEM column shifts, so SAME padding needs no HBM-side pad), and
accumulates channel groups of 128 into an fp32 scratch across the innermost
grid dimension.

Reference counterpart: the torch VAE/UNet convs are plain `nn.Conv2d`
(examples/stable-diffusion/ldm/modules/diffusionmodules/model.py:42-55);
their speed is cuDNN's concern. On TPU the "library" path is XLA, and XLA
leaves 3-4x on the table at exactly the decoder's hot shapes — so this is
where a native kernel pays.

Grid: (B, H/TH, C/128). For one (b, i) output slab the C-group dimension
iterates innermost (sequentially on TPU), so the fp32 accumulator scratch
persists across groups and the output block is written once on the last
group. Halo rows come from neighbor-indexed copies of x (previous/current/
next row slab); image top/bottom rows are zero-masked via the grid index.
TH adapts to W so a slab is always TH*W = 3072 rows-by-lanes (~0.8 MB
per 128-channel group) and the whole program stays inside scoped VMEM.

The public entry `conv3x3` falls back to `lax.conv_general_dilated` out of
regime (stride != 1, non-3x3, channels not lane-aligned, small spatial
where XLA is already fast) and is differentiable either way: the custom VJP
computes dx as a 3x3 conv of the cotangent with the spatially-flipped,
transposed kernel (itself this kernel when in regime) and dw/db via XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as _nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CG = 128  # channel-group width (one lane tile)


def _vmem_est(th: int, w: int, co: int) -> int:
    """Scoped-VMEM bytes for one program: 3 double-buffered input slabs,
    double-buffered output + weight blocks, the f32 accumulator, and the
    in-kernel temporaries (slab concat, shifted copies, taps concat)."""
    slab = th * w * _CG * 2
    out = th * w * co * 2
    return (6 * slab + 2 * out + th * w * co * 4 + 2 * 3 * 3 * _CG * co * 2
            + 3 * slab + th * w * 3 * _CG * 2)


def _pick_th(h: int, w: int, co: int) -> int:
    """Rows per program: the largest divisor of H that fits the (16 MB,
    keep ~3 MB headroom) scoped-VMEM budget, capped at TH*W ~ 8192 output
    rows-by-lanes (the M of the MXU matmuls — bigger buys nothing)."""
    best = 1
    for th in range(2, h + 1):
        if th * w > 8192:
            break
        if h % th == 0 and _vmem_est(th, w, co) <= 12_500_000:
            best = th
    return best


def _kernel(xm_ref, x0_ref, xp_ref, w_ref, o_ref, acc_ref, *,
            nh: int, nc: int, th: int):
    i = pl.program_id(1)
    cg = pl.program_id(2)

    @pl.when(cg == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x0 = x0_ref[0]
    th_, w_len, c = x0.shape
    # halo rows; zeroed at the image top/bottom (SAME padding)
    top = jnp.where(i == 0, jnp.zeros_like(xm_ref[0][-1:]), xm_ref[0][-1:])
    bot = jnp.where(i == nh - 1, jnp.zeros_like(xp_ref[0][:1]),
                    xp_ref[0][:1])
    slab = jnp.concatenate([top, x0, bot], axis=0)  # (TH+2, W, 128)

    def taps(rows):  # (TH, W, 128) -> (TH, W, 384): dx = -1, 0, +1 taps
        left = jnp.pad(rows[:, :-1], ((0, 0), (1, 0), (0, 0)))
        right = jnp.pad(rows[:, 1:], ((0, 0), (0, 1), (0, 0)))
        return jnp.concatenate([left, rows, right], axis=-1)

    acc = acc_ref[...]
    for dy in range(3):
        t = taps(slab[dy:dy + th]).reshape(th * w_len, 3 * c)
        acc += jax.lax.dot_general(
            t, w_ref[0, dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(cg == nc - 1)
    def _finish():
        co = o_ref.shape[-1]
        o_ref[0] = acc_ref[...].reshape(th_, w_len, co).astype(o_ref.dtype)


def _pallas_conv3x3(x, w, *, interpret: bool = False):
    b, h, w_len, c = x.shape
    co = w.shape[-1]
    th = _pick_th(h, w_len, co)
    nh, nc = h // th, c // _CG
    # (3, 3, C, CO) -> (nc, 3, 3*128, CO): per channel group and vertical
    # tap dy, rows ordered [w[dy,0] | w[dy,1] | w[dy,2]] to match `taps`'s
    # [left | center | right] concat (output col j reads input col j-1 from
    # the left-shifted copy, which pairs with the dx=0 filter tap).
    wt = (w.reshape(3, 3, nc, _CG, co)
          .transpose(2, 0, 1, 3, 4)
          .reshape(nc, 3, 3 * _CG, co))
    idx_m = lambda bb, i, g: (bb, jnp.maximum(i - 1, 0), 0, g)
    idx_0 = lambda bb, i, g: (bb, i, 0, g)
    idx_p = lambda bb, i, g: (bb, jnp.minimum(i + 1, nh - 1), 0, g)
    slab_spec = lambda im: pl.BlockSpec((1, th, w_len, _CG), im,
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nh=nh, nc=nc, th=th),
        grid=(b, nh, nc),
        in_specs=[
            slab_spec(idx_m), slab_spec(idx_0), slab_spec(idx_p),
            pl.BlockSpec((1, 3, 3 * _CG, co), lambda bb, i, g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_len, co),
                               lambda bb, i, g: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_len, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * w_len, co), jnp.float32)],
        interpret=interpret,
    )(x, x, x, wt)


def conv3x3_supported(x_shape, w_shape) -> bool:
    """Shape regime where the Pallas path applies AND measured faster than
    XLA on v5e (benchmarks/conv3x3_bench.py). Small-spatial shapes stay on
    XLA — it already runs them at 150+ TF/s."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(w_shape[:2]) != (3, 3):
        return False
    b, h, w_len, c = x_shape
    co = w_shape[-1]
    if c % _CG or co % _CG or w_len % 8 or h % _pick_th(h, w_len, co):
        return False
    # measured crossover: the XLA stall regime is H*W >= 192^2
    return h * w_len >= 192 * 192


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, bias: Optional[jax.Array] = None,
            force: Optional[bool] = None, interpret: bool = False):
    """3x3 stride-1 SAME NHWC conv: Pallas slab kernel in regime, XLA
    otherwise. x: (B, H, W, C); w: (3, 3, C, CO); bias: (CO,) or None."""
    return _conv3x3_fwd_impl(x, w, bias, force, interpret)


def _conv3x3_fwd_impl(x, w, bias, force, interpret):
    use = conv3x3_supported(x.shape, w.shape) if force is None else force
    use = use and (interpret or jax.default_backend() == "tpu")
    if use or interpret:
        out = _pallas_conv3x3(x, w.astype(x.dtype), interpret=interpret)
    else:
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv3x3_fwd(x, w, bias, force, interpret):
    return (_conv3x3_fwd_impl(x, w, bias, force, interpret),
            (x, w, bias is not None))


def _conv3x3_bwd(force, interpret, res, g):
    x, w, has_bias = res
    # dx: SAME 3x3 conv of g with the spatially-flipped, in/out-transposed
    # kernel — same op family, so it reuses the fast path when in regime.
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    dx = _conv3x3_fwd_impl(g, w_flip, None, None, interpret)
    # dw: correlation over batch+space — an XLA conv with the batch and
    # feature roles swapped (K = B*H*W keeps the MXU dense).
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(w.dtype) if has_bias else None
    return dx.astype(x.dtype), dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


class Conv3x3(_nn.Module):
    """Drop-in for `nn.Conv(features, (3, 3), padding=1)` routed through the
    slab kernel when in regime (param names/shapes identical to nn.Conv, so
    checkpoint converters are unaffected)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: object = None
    use_bias: bool = True
    quant: Optional[str] = None

    @_nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = self.kernel_init or _nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (3, 3, c, self.features))
        bias = (self.param("bias", _nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x = x.astype(self.dtype)
        from dpm_solver_tpu.ops.quant import wants_conv_quant

        if wants_conv_quant(self.quant):
            from dpm_solver_tpu.ops.quant import w8a8_conv

            return w8a8_conv(x, kernel, bias)
        return conv3x3(x, kernel, None if bias is None
                       else bias.astype(self.dtype))
