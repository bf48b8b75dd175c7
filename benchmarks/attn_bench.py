"""Attention kernel microbenchmark: XLA vs full-panel vs flash.

Reproduces the dispatch-heuristic numbers in ops/attention.py
(token_attention's `use_pallas` policy and block-size choices). Shapes are
the SD-2.1@768px hot spots plus the short-T regime where XLA wins.

Run on a TPU host: python benchmarks/attn_bench.py  (~5-10 min of compiles)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

SHAPES = [
    # (BH, T, dh)            # where it occurs
    (40, 9216, 64),          # SD-2.1@768 ds1 self-attn (batch 4 CFG)
    (80, 2304, 64),          # SD-2.1@768 ds2 self-attn
    (64, 256, 128),          # DDPM CIFAR AttnBlock @16x16, batch 64
    (64, 256, 512),          # NCSN++ mid-block
]


def main():
    import jax
    import jax.numpy as jnp

    from dpm_solver_tpu.ops.attention import (
        attention_xla,
        flash_attention,
        flash_block_q,
        fused_attention,
        panel_block_q,
        panel_fits_vmem,
    )

    def sync(o):
        return float(o.ravel()[0])

    def timeit(f, *a, reps=10):
        sync(f(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = f(*a)
        sync(out)
        return (time.perf_counter() - t0) / reps

    rs = np.random.RandomState(0)
    for bh, t, d in SHAPES:
        q = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(bh, t, d), jnp.bfloat16)
        flops = 4 * bh * t * t * d
        row = [f"BH={bh} T={t} d={d}:"]
        tx = timeit(jax.jit(lambda q, k, v: attention_xla(q, k, v)), q, k, v)
        row.append(f"xla {tx*1e3:.2f}ms ({flops/tx/1e12:.0f}TF/s)")
        if panel_fits_vmem(t, d):
            bq = panel_block_q(t)
            tp = timeit(jax.jit(
                lambda q, k, v, bq=bq: fused_attention(q, k, v, None, bq)),
                q, k, v)
            row.append(f"panel[{bq}] {tp*1e3:.2f}ms "
                       f"({flops/tp/1e12:.0f}TF/s, {tx/tp:.2f}x)")
        bq = flash_block_q(t)
        tf = timeit(jax.jit(
            lambda q, k, v, bq=bq: flash_attention(q, k, v, None, bq, 1024)),
            q, k, v)
        row.append(f"flash[{bq}/1024] {tf*1e3:.2f}ms "
                   f"({flops/tf/1e12:.0f}TF/s, {tx/tf:.2f}x)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
