"""MXU-fill probe for the dh=64 attention matmuls (VERDICT r4 item 2).

BASELINE.md's roofline halves the attention ceiling to ~98 TF/s because
both attention matmuls at SD's dh=64 under-fill the 128x128 MXU: QK^T
contracts over dh (64 of 128 sublanes), P@V emits dh output lanes (64 of
128). The round-4 verdict flagged that ceiling as asserted-not-attacked:
"packing two heads along the contraction/lane dimension" might restore
full fill. This probe measures every packing candidate at the real SD
site shapes so the ceiling is either moved or proven.

The structural analysis first (what the probe checks):

  QK^T = Q(bq,64) @ K(bk,64)^T — the contraction IS dh. Packing two
  heads' K block-diagonally ([K0 0; 0 K1], (2bk,128)) fills all 128
  sublanes but computes 2x the raw MACs for 2x the useful work — exactly
  50% useful fill again. Any single MXU contraction producing two
  independent per-head products needs those zero blocks (the matmul sums
  over the full contraction dim), so 50% is structural for QK^T. The
  probe's qk_pair_blockdiag row tests whether the hardware nevertheless
  prefers one full-depth pass over two half-depth ones (pipeline
  efficiency, not ceiling).

  P@V = P(bq,bk) @ V(bk,64) — contraction bk is full; dh=64 lands on the
  OUTPUT LANES (half idle). Unlike QK^T this is fixable: transpose the
  product. out^T = V^T(64,bk) @ P^T(bk,bq) puts the full contraction on
  the sublanes and bq (>=128) on the lanes; dh=64 moves to the streaming
  m-dim where it costs pipeline fill, not array fill. Ceiling 197, not 98.

Rows (bf16 operands, f32 accumulation, real site extents, chain-timed):
  qk_current         einsum bqd,bkd->bqk   (the kernel's QK^T today)
  qk_pair_blockdiag  heads packed in pairs, 128-deep block-diag contraction
  qk_full_control    dh=128 contraction (the rate the MXU gives full fill)
  pv_current         einsum bqk,bkd->bqd   (the kernel's P@V today)
  pv_transposed      einsum bdk,bkq->bdq   (out^T = V^T P^T, full fill)
  pv_pair_blockdiag  [P0|P1] @ [V0 0; 0 V1] (full lanes, 2x raw MACs)
  pv_full_control    d=128 output lanes

tflops_s is USEFUL flops/s everywhere (block-diag raw MACs are 2x that).

Run on a TPU host: python benchmarks/dh64_fill_probe.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _chain(kernel, carry, extras, fold, iters=20, reps=3):
    """chain_time (benchmarks/_timing.py) with a custom carry fold, for
    kernels whose output shape can't be sliced back onto the carry."""
    import time

    import jax
    import jax.numpy as jnp

    eps = jnp.asarray(2.0 ** -120, jnp.float32)

    fn = jax.jit(lambda c, *ex: jax.lax.fori_loop(
        0, iters, lambda i, cc: fold(cc, kernel(cc, *ex), eps), c))
    out = fn(carry, *extras)
    float(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(carry, *extras)
    float(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    import jax.numpy as jnp

    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()

    rs = np.random.RandomState(0)
    bf16 = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.1, bf16)

    def dot_bf16(a, b, dims):
        import jax

        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32).astype(bf16)

    # slice the (large) matmul output back onto the carry
    def fold_slice(c, o, eps):
        return c + eps.astype(c.dtype) * o[..., : c.shape[-1]]

    # fold a smaller-last-dim output into the carry's leading lanes
    def fold_into(c, o, eps):
        upd = (o * eps.astype(o.dtype)).astype(c.dtype)
        return c.at[..., : o.shape[-1]].add(upd)

    report = {
        "metric": "dh64_mxu_fill_probe_v5e",
        "method": "in-program 20-iter chained loop, 3 reps "
                  "(benchmarks/_timing.py methodology)",
        "sites": {},
    }

    # Site extents: one query block's worth of work across all heads of
    # the real SD sites (batch 4 x 2 CFG): 9216-token 96px self-attn has
    # BH=40 heads; 2304-token 48px has BH=80. bq=1024/768 per the swept
    # production tiles.
    for site, (bh, bq, s) in {"t9216": (40, 1024, 9216),
                              "t2304": (80, 768, 2304)}.items():
        rows = {}
        useful = 2 * bh * bq * s * 64  # per-head-set flops of ONE matmul

        def run(tag, kernel, carry, extras, fold, flops=None):
            dt = _chain(kernel, carry, extras, fold)
            fl = useful if flops is None else flops
            rows[tag] = {"ms": round(dt * 1e3, 3),
                         "useful_tflops_s": round(fl / dt / 1e12, 1)}
            print(f"# {site} {tag}: {rows[tag]}", file=sys.stderr,
                  flush=True)

        batch_dims = (((2,), (2,)), ((0,), (0,)))  # bqd,bkd->bqk

        # ---- QK^T ----
        q = mk(bh, bq, 64)
        k = mk(bh, s, 64)
        run("qk_current",
            lambda c, kk: dot_bf16(c, kk, batch_dims), q, (k,), fold_slice)

        # heads paired: Qp = [Q0|Q1] (bh/2, bq, 128); Kp block-diag
        # (bh/2, 2s, 128). Same useful flops, 2x raw MACs.
        qp = mk(bh // 2, bq, 128)
        k2 = rs.randn(bh // 2, 2 * s, 128) * 0.1
        k2[:, :s, 64:] = 0.0
        k2[:, s:, :64] = 0.0
        kp = jnp.asarray(k2, bf16)
        run("qk_pair_blockdiag",
            lambda c, kk: dot_bf16(c, kk, batch_dims), qp, (kp,), fold_slice)

        # full-fill control: what the MXU gives a 128-deep contraction
        qf = mk(bh, bq, 128)
        kf = mk(bh, s, 128)
        run("qk_full_control",
            lambda c, kk: dot_bf16(c, kk, batch_dims), qf, (kf,),
            fold_slice, flops=2 * bh * bq * s * 128)

        # ---- P @ V ----
        pv_dims = (((2,), (1,)), ((0,), (0,)))  # bqk,bkd->bqd
        p = mk(bh, bq, s)
        v = mk(bh, s, 64)
        run("pv_current",
            lambda c, pp: dot_bf16(pp, c, pv_dims), v, (p,), fold_into)

        # transposed: out^T = V^T @ P^T — contraction s on the sublanes,
        # bq on the lanes, dh=64 streams. Full MXU fill.
        vt = mk(bh, 64, s)
        pt = mk(bh, s, bq)
        run("pv_transposed",
            lambda c, pp: dot_bf16(c, pp, pv_dims), vt, (pt,), fold_slice)

        # block-diag pair: [P0|P1] (bh/2, bq, 2s) @ [V0 0; 0 V1]
        # (bh/2, 2s, 128) -> (bh/2, bq, 128). Full lanes, 2x raw MACs.
        p2 = mk(bh // 2, bq, 2 * s)
        v2 = rs.randn(bh // 2, 2 * s, 128) * 0.1
        v2[:, :s, 64:] = 0.0
        v2[:, s:, :64] = 0.0
        vp = jnp.asarray(v2, bf16)
        run("pv_pair_blockdiag",
            lambda c, pp: dot_bf16(pp, c, pv_dims), vp, (p2,), fold_into)

        # full-fill control: d=128 output lanes
        vf = mk(bh, s, 128)
        run("pv_full_control",
            lambda c, pp: dot_bf16(pp, c, pv_dims), vf, (p,), fold_into,
            flops=2 * bh * bq * s * 128)

        report["sites"][site] = rows

    out = __file__.rsplit("/", 1)[0] + "/results_dh64_fill_probe_v5e.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
