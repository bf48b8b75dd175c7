"""3x3 conv: Pallas slab kernel vs XLA at the VAE/UNet hot shapes.

Motivation (measured first, v5e bf16 batch 4): the VAE decoder spends
~330 ms of its 450 ms in the 768px/384px levels where XLA's conv runs at
31-53 TF/s, while the same network's 96px convs reach 150+ TF/s. This
script A/Bs `ops/conv3x3.py` against `lax.conv_general_dilated` per shape
and prints the dispatch table the `conv3x3_supported` crossover encodes.

Run on a TPU host: python benchmarks/conv3x3_bench.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# (B, H, W, C, CO)                 # where it occurs (decode @768px, b4)
SHAPES = [
    (4, 768, 768, 128, 128),       # VAE up_0 resblocks
    (4, 768, 768, 256, 128),       # VAE up_0 first block / shortcut
    (4, 768, 768, 256, 256),       # VAE up_1 upsample conv
    (4, 384, 384, 256, 256),       # VAE up_1 resblocks
    (4, 384, 384, 512, 256),       # VAE up_1 first block
    (4, 192, 192, 512, 512),       # VAE up_2 resblocks (XLA ~83 TF/s)
    (4, 96, 96, 512, 512),         # VAE mid / up_3 (XLA already fast)
    (8, 96, 96, 320, 320),         # SD UNet level-0 resblocks (CFG b4)
    (8, 256, 256, 256, 256),       # ADM ImageNet-256 level 0 (guided b8)
    (8, 256, 256, 128, 128),       # ADM classifier / NCSN++ church lvl 0
    (8, 128, 128, 256, 256),       # ADM ImageNet-256 level 1
    (8, 128, 128, 512, 512),       # ADM ImageNet-512-class level shapes
    (16, 256, 256, 128, 128),      # NCSN++ 256px serving batch
]


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks._cache import enable_compile_cache
    enable_compile_cache()
    from dpm_solver_tpu.ops.conv3x3 import conv3x3, conv3x3_supported

    def sync(o):
        return float(o.ravel()[0])

    def timeit(f, *a, reps=6):
        sync(f(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = f(*a)
        sync(out)
        return (time.perf_counter() - t0) / reps

    rs = np.random.default_rng(0)
    for b, h, w, c, co in SHAPES:
        x = jnp.asarray(rs.standard_normal((b, h, w, c)), jnp.bfloat16)
        wt = jnp.asarray(rs.standard_normal((3, 3, c, co)) * 0.05,
                         jnp.bfloat16)
        flops = 2 * 9 * b * h * w * c * co
        xla = jax.jit(lambda x, w: conv3x3(x, w, None, False))
        tx = timeit(xla, x, wt)
        row = [f"{b}x{h}x{w}x{c}->{co}:",
               f"xla {tx*1e3:.2f}ms ({flops/tx/1e12:.0f}TF/s)"]
        if c % 128 == 0 and co % 128 == 0:
            try:
                pal = jax.jit(lambda x, w: conv3x3(x, w, None, True))
                tp = timeit(pal, x, wt)
                d = float(jnp.max(jnp.abs(
                    pal(x, wt).astype(jnp.float32) -
                    xla(x, wt).astype(jnp.float32))))
                row.append(f"pallas {tp*1e3:.2f}ms ({flops/tp/1e12:.0f}TF/s, "
                           f"{tx/tp:.2f}x, max|d| {d:.1e})")
                row.append(f"dispatch={'pallas' if conv3x3_supported(x.shape, wt.shape) else 'xla'}")
            except Exception as e:  # noqa: BLE001 - keep surveying shapes
                row.append(f"pallas FAILED: {type(e).__name__}: "
                           f"{str(e).splitlines()[0][:120]}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
