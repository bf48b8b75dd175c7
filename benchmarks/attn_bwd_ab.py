"""Attention-backward A/B: transposed-output kernels vs normal vs XLA VJP.

The backward pass has five matmuls per (q,k) block pair. Two contract
over dh and are structurally stuck at half MXU fill for dh=64 (logits
rebuild, dp = dO V^T — the QK^T argument, see ops/attention.py). The
other three (dq, dk, dv) only SUFFER dh on their output lanes, and an
operand-order swap emits them transposed with full contraction AND full
lanes (_dq_kernel_T/_dkv_kernel_T). Ceiling for the five-matmul pass:
98.5 -> 5/(2/98.5 + 3/197) = 141 TF/s.

Arms (chain-timed, benchmarks/_timing.py):
  bwd_t      _mha_backward(..., t_out=True)   (production at dh<=64)
  bwd_n      _mha_backward(..., t_out=False)  (the pre-r5 orientation)
  xla_vjp    jax.grad through the plain einsum composition

Sites: the SD self-attention shapes (b4 x 2 CFG). Useful flops counted
as 5 matmuls x 2*T*S*dh (the backward's actual MXU work, excluding the
forward that produced the residuals).

Run on a TPU host: python benchmarks/attn_bwd_ab.py
Writes results_attn_bwd_ab_v5e.json.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks._cache import enable_compile_cache
    from benchmarks._timing import chain_time
    enable_compile_cache()
    from dpm_solver_tpu.ops import attention as A

    rs = np.random.RandomState(0)
    report = {"metric": "attn_bwd_ab_v5e",
              "method": "chain-timed (20-iter in-program loop, 3 reps)",
              "sites": {}}

    for site, (bh, t, bq, bk) in {
            "t9216": (40, 9216, 1024, 512),
            "t2304": (80, 2304, 768, 512)}.items():
        s, d = t, 64
        q = jnp.asarray(rs.randn(bh, t, d) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rs.randn(bh, s, d) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rs.randn(bh, s, d) * 0.1, jnp.bfloat16)
        scale = d ** -0.5
        # real residuals (o, lse) so exp2(logits - lse) stays in range
        o, lse = A._flash_forward(q, k, v, scale, 512, 1024, False,
                                  with_lse=True)
        g = jnp.asarray(rs.randn(bh, t, d) * 0.1, jnp.bfloat16)
        flops = 5 * 2 * bh * t * s * d
        rows = {}
        eps = jnp.asarray(2.0 ** -120, jnp.float32)

        def run(tag, kernel, extras):
            dt = chain_time(kernel, g, extras=extras)
            rows[tag] = {"ms": round(dt * 1e3, 3),
                         "tflops_s": round(flops / dt / 1e12, 1)}
            print(f"# {site} {tag}: {rows[tag]}", file=sys.stderr,
                  flush=True)

        def bwd(t_out):
            def f(gg, qq, kk, vv, oo, ll):
                dq, dk, dv = A._mha_backward(
                    qq, kk, vv, oo, ll, gg, scale, bq, bk, False,
                    t_out=t_out)
                # fold dk/dv in at eps weight so neither pallas_call is
                # dead-code eliminated
                return dq + (eps * (dk + dv)).astype(dq.dtype)
            return f

        run("bwd_t", bwd(True), (q, k, v, o, lse))
        run("bwd_n", bwd(False), (q, k, v, o, lse))

        def xla_vjp(gg, qq, kk, vv):
            _, pull = jax.vjp(
                lambda a, b, c: A.attention_xla(a, b, c, scale=scale),
                qq, kk, vv)
            dq, dk, dv = pull(gg)
            return dq + (eps * (dk + dv)).astype(dq.dtype)

        if t <= 4096:  # the (T,T) XLA logits tensor OOMs the 9216 site
            run("xla_vjp", xla_vjp, (q, k, v))

        report["sites"][site] = rows

    path = __file__.rsplit("/", 1)[0] + "/results_attn_bwd_ab_v5e.json"
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
