"""Composed-kernel A/B for the dh=64 MXU half-fill attack (VERDICT r4 #2).

BASELINE.md's ceiling proof halves the attention roofline to ~98 TF/s at
SD's dh=64 (QK^T fills 64/128 sublanes, P@V fills 64/128 lanes) and the
round-4 verdict flagged that as asserted-not-attacked. The structural
analysis (ops/attention.py, _flash_kernel_T header): QK^T is stuck — its
contraction IS dh, and block-diag head-pair packing spends 2x raw MACs
for 2x useful work (any single contraction yielding two independent
per-head products needs the zero blocks). P@V is NOT stuck: computed
transposed (acc^T = V^T P^T) its contraction is the full key block and
its lanes the full query block; dh=64 moves to the streaming m-dim.

A first XLA-einsum probe was retired as confounded: at these extents the
(bq, S) logits tensor round-trips HBM between the einsums, so every row
measured bandwidth, not MXU fill (the 2x-flops full-fill control ran in
the SAME time as the half-fill arm). The honest measurement is the
composed kernel, where p never leaves VMEM — this A/B.

Arms per SD self-attention site ((40, 9216, 64) at 96px b4x2CFG,
(80, 2304, 64) at 48px):
  production   token_attention's dispatch today (full-panel or streamed
               flash + mxu_rowsum, swept tiles)
  flash        plain streamed flash at the swept tile (baseline for T)
  flash_t      the transposed-product kernel, block_q per flash_t_block_q
  flash_t_bqXX tile variants around it

Everything chain-timed in ONE jit program (benchmarks/_timing.py; the
tunnel adds 0.2-3 ms/dispatch to per-call timings). tflops_s counts the
2*2*T*S*dh useful attention flops.

Run on a TPU host: python benchmarks/dh64_fill_ab.py
Writes results_dh64_fill_v5e.json.
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax.numpy as jnp

    from benchmarks._cache import enable_compile_cache
    from benchmarks._timing import chain_time
    enable_compile_cache()
    from dpm_solver_tpu.ops import attention as A

    rs = np.random.RandomState(0)
    report = {"metric": "dh64_fill_ab_v5e",
              "method": "chain-timed (20-iter in-program loop, 3 reps)",
              "sites": {}}

    # t9216/t2304: the SD-2.1 768px self-attn sites (batch 4 x 2 CFG);
    # t1024: the guided ADM-256 32px site (batch 8, 16 heads) — decides
    # the panel-T gate's lower edge (token_attention s >= 2048 today)
    for site, (bh, t) in {"t9216": (40, 9216), "t2304": (80, 2304),
                          "t1024": (128, 1024)}.items():
        s, d = t, 64
        q = jnp.asarray(rs.randn(bh, t, d) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rs.randn(bh, s, d) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rs.randn(bh, s, d) * 0.1, jnp.bfloat16)
        flops = 2 * 2 * bh * t * s * d
        rows = {}

        def run(tag, kernel):
            try:
                dt = chain_time(kernel, q, extras=(k, v))
            except Exception as e:  # noqa: BLE001 — keep other arms
                rows[tag] = f"FAILED: {type(e).__name__}"
                print(f"# {site} {tag} FAILED: {e}", file=sys.stderr,
                      flush=True)
                return None
            rows[tag] = {"ms": round(dt * 1e3, 3),
                         "tflops_s": round(flops / dt / 1e12, 1)}
            print(f"# {site} {tag}: {rows[tag]}", file=sys.stderr,
                  flush=True)
            return dt

        # production dispatch (num_heads=1 on the pre-split (BH, T, dh)
        # panels routes through exactly the per-head kernel + tile the
        # model's multi-head call reaches)
        run("production",
            lambda qq, kk, vv: A.token_attention(qq, kk, vv, num_heads=1))

        # plain streamed flash at the swept tile (like-for-like baseline)
        bq_f = A.flash_block_q(t, d)
        run("flash", lambda qq, kk, vv: A.flash_attention(
            qq, kk, vv, None, bq_f, A._BLOCK_K, False, True))

        # transposed kernel at its default + neighbors
        for bq in sorted({A.flash_t_block_q(t, d), 512, 1024}):
            run(f"flash_t_bq{bq}", lambda qq, kk, vv, b=bq: A.flash_attention_t(
                qq, kk, vv, None, b, A._BLOCK_K))

        # smaller key blocks change the logits^T aspect ratio
        run("flash_t_bq512_bk512", lambda qq, kk, vv: A.flash_attention_t(
            qq, kk, vv, None, 512, 512))
        if t >= 8192:  # deeper key blocks at the long site
            run("flash_t_bq1024_bk1536",
                lambda qq, kk, vv: A.flash_attention_t(
                    qq, kk, vv, None, 1024, 1536))
            run("flash_t_bq512_bk2304",
                lambda qq, kk, vv: A.flash_attention_t(
                    qq, kk, vv, None, 512, 2304))
            run("flash_t_bq768_bk2304",
                lambda qq, kk, vv: A.flash_attention_t(
                    qq, kk, vv, None, 768, 2304))
        if A.panel_fits_vmem(s, d):
            # transposed FULL-PANEL kernel (single-pass softmax, K/V
            # loaded once per q block, full-fill P@V)
            for bq in sorted({A.panel_t_block_q(t, s), 384, 768}):
                run(f"panel_t_bq{bq}",
                    lambda qq, kk, vv, b=bq: A.fused_attention_t(
                        qq, kk, vv, None, b))

        report["sites"][site] = rows

    ok = [r for site in report["sites"].values() for r in site.values()
          if isinstance(r, dict)]
    if ok:
        path = __file__.rsplit("/", 1)[0] + "/results_dh64_fill_v5e.json"
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
