"""Host-IO A/B: native C++ runtime (dpm_solver_tpu/native) vs the pure
Python/PIL and tf.data paths it replaces.

Scope: this is HOST-side work — PNG shuttling for the FID protocol
(ref runners/diffusion.py:450-457 writes, evaluate/fid_score.py:146-170
re-reads; 50k files per eval) and TFRecord scanning for the data plane (ref
score_sde_jax/datasets.py:103-199 via tf.data). CPU measurements are the
real deployment numbers; no chip involved.

Prints one JSON line per axis: write/read/scan throughput + speedup.
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_png(n, res, threads):
    from PIL import Image

    from dpm_solver_tpu import native

    assert native.available(), "native toolchain unavailable"
    rng = np.random.default_rng(0)
    # realistic content: smooth images compress like samples do, unlike
    # white noise (which makes zlib the whole benchmark)
    base = rng.random((res // 8, res // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    imgs = np.stack([
        np.clip(img * 255 + rng.normal(0, 8, img.shape), 0, 255)
        for _ in range(n)]).astype(np.uint8)

    with tempfile.TemporaryDirectory() as d:
        nat = [os.path.join(d, f"n{i}.png") for i in range(n)]
        pil = [os.path.join(d, f"p{i}.png") for i in range(n)]

        t0 = time.perf_counter()
        native.write_png_batch(imgs, nat, threads=threads)
        t_nat_w = time.perf_counter() - t0

        t0 = time.perf_counter()
        for im, p in zip(imgs, pil):
            Image.fromarray(im).save(p)
        t_pil_w = time.perf_counter() - t0

        t0 = time.perf_counter()
        back = native.read_png_batch(nat, threads=threads)
        t_nat_r = time.perf_counter() - t0

        t0 = time.perf_counter()
        back_pil = np.stack([np.asarray(Image.open(p).convert("RGB"))
                             for p in nat])
        t_pil_r = time.perf_counter() - t0

        np.testing.assert_array_equal(back, imgs)
        np.testing.assert_array_equal(back_pil, imgs)

    return {
        "write": {"native_img_s": n / t_nat_w, "pil_img_s": n / t_pil_w,
                  "speedup": t_pil_w / t_nat_w},
        "read": {"native_img_s": n / t_nat_r, "pil_img_s": n / t_pil_r,
                 "speedup": t_pil_r / t_nat_r},
    }


def bench_tfrecord(n, payload_kb):
    from dpm_solver_tpu import native

    rng = np.random.default_rng(1)

    def ld(field, payload):
        out = bytes([field << 3 | 2])
        m = len(payload)
        while True:
            b = m & 0x7F
            m >>= 7
            out += bytes([b | (0x80 if m else 0)])
            if not m:
                return out + payload

    def example(blob, label):
        img_feat = ld(1, ld(1, blob))
        lbl_feat = ld(3, bytes([1 << 3 | 0, label & 0x7F]))
        entries = (ld(1, ld(1, b"image") + ld(2, img_feat))
                   + ld(1, ld(1, b"label") + ld(2, lbl_feat)))
        return ld(1, entries)

    import struct

    def mask(c):
        return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bench.tfrecord")
        with open(path, "wb") as f:
            for i in range(n):
                p = example(rng.integers(0, 256, payload_kb * 1024,
                                         dtype=np.uint8).tobytes(), i)
                header = struct.pack("<Q", len(p))
                f.write(header)
                f.write(struct.pack("<I", mask(native.crc32c(header))))
                f.write(p)
                f.write(struct.pack("<I", mask(native.crc32c(p))))
        size_mb = os.path.getsize(path) / 1e6

        t0 = time.perf_counter()
        offs, lens = native.tfrecord_index(path)  # CRC-verified
        blob = np.memmap(path, np.uint8, mode="r")
        n_label = 0
        for o, ln in zip(offs, lens):
            rec = bytes(blob[o:o + ln])
            native.example_bytes(rec, "image")
            n_label += native.example_int64(rec, "label") >= 0
        t_nat = time.perf_counter() - t0
        assert len(offs) == n and n_label == n

        t_tf = None
        try:
            import tensorflow as tf

            tf.config.experimental.set_visible_devices([], "GPU")
            spec = {"image": tf.io.FixedLenFeature([], tf.string),
                    "label": tf.io.FixedLenFeature([], tf.int64)}
            t0 = time.perf_counter()
            count = 0
            for rec in tf.data.TFRecordDataset(path):
                ex = tf.io.parse_single_example(rec, spec)
                _ = ex["image"]
                count += 1
            t_tf = time.perf_counter() - t0
            assert count == n
        except ImportError:
            pass

    out = {"native_mb_s": size_mb / t_nat, "native_rec_s": n / t_nat}
    if t_tf is not None:
        out.update(tf_mb_s=size_mb / t_tf, tf_rec_s=n / t_tf,
                   speedup=t_tf / t_nat)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500, help="images / records")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--payload-kb", type=int, default=48)
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()

    png = bench_png(args.n, args.res, args.threads)
    tfr = bench_tfrecord(args.n, args.payload_kb)
    result = {
        "metric": "png_write_images_per_s",
        "value": round(png["write"]["native_img_s"], 1),
        "unit": f"img/s @{args.res}px",
        "vs_baseline": round(png["write"]["speedup"], 2),
        "detail": {"png": png, "tfrecord": tfr,
                   "n": args.n, "res": args.res},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
