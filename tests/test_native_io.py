"""Native host-IO runtime (dpm_solver_tpu/native: C++ via ctypes).

Oracles: PIL for PNG pixel fidelity, tf.io for TFRecord framing and
tf.train.Example wire format (the reference's data plane is tf.data,
score_sde_jax/datasets.py:103-199), the CRC32C known-answer vector, and the
pure-Python fallbacks (which must agree bit-for-bit with the C++ paths)."""

import os

import numpy as np
import pytest

from dpm_solver_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_crc32c_known_answer():
    # RFC 3720 / Castagnoli check value
    assert native.crc32c(b"123456789") == 0xE3069283
    assert native.crc32c(b"") == 0


def test_png_roundtrip_rgb_and_gray(tmp_path):
    rng = np.random.default_rng(0)
    for c in (1, 3, 4):
        imgs = rng.integers(0, 256, size=(5, 23, 31, c), dtype=np.uint8)
        paths = [str(tmp_path / f"im_{c}_{i}.png") for i in range(5)]
        native.write_png_batch(imgs, paths)
        assert native.png_probe(paths[0]) == (23, 31, c)
        back = native.read_png_batch(paths)
        np.testing.assert_array_equal(back, imgs)


def test_png_matches_pil_both_directions(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)
    ours = str(tmp_path / "ours.png")
    native.write_png_batch(img[None], [ours])
    np.testing.assert_array_equal(np.asarray(Image.open(ours)), img)
    theirs = str(tmp_path / "pil.png")
    Image.fromarray(img).save(theirs)
    np.testing.assert_array_equal(native.read_png_batch([theirs])[0], img)


def test_png_read_channel_conversion(tmp_path):
    """Gray source read as RGB (the FID folder reader requests channels=3)."""
    gray = np.arange(64, dtype=np.uint8).reshape(1, 8, 8, 1)
    p = str(tmp_path / "g.png")
    native.write_png_batch(gray, [p])
    rgb = native.read_png_batch([p], channels=3)
    assert rgb.shape == (1, 8, 8, 3)
    np.testing.assert_array_equal(rgb, np.repeat(gray, 3, axis=-1))


def test_png_write_3d_batch(tmp_path):
    imgs = np.random.default_rng(2).integers(
        0, 256, size=(3, 9, 9), dtype=np.uint8)
    paths = [str(tmp_path / f"g{i}.png") for i in range(3)]
    native.write_png_batch(imgs, paths)  # (N,H,W) -> grayscale
    np.testing.assert_array_equal(
        native.read_png_batch(paths)[..., 0], imgs)


def test_decode_image_batch_png_and_jpeg(tmp_path):
    """In-memory batch decode: PNG bit-exact round trip; JPEG matches PIL's
    decode of the same payload exactly (same libjpeg underneath)."""
    import io as _io

    from PIL import Image

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, size=(4, 12, 14, 3), dtype=np.uint8)
    png_payloads = []
    for im in imgs:
        buf = _io.BytesIO()
        Image.fromarray(im).save(buf, format="PNG")
        png_payloads.append(buf.getvalue())
    h, w, c, kind = native.image_probe_mem(png_payloads[0])
    assert (h, w, c, kind) == (12, 14, 3, "png")
    out = native.decode_image_batch(png_payloads, 12, 14, 3)
    np.testing.assert_array_equal(out, imgs)

    jpg = _io.BytesIO()
    Image.fromarray(imgs[0]).save(jpg, format="JPEG", quality=90)
    payload = jpg.getvalue()
    h, w, c, kind = native.image_probe_mem(payload)
    assert (h, w, c, kind) == (12, 14, 3, "jpeg")
    ours = native.decode_image_batch([payload], 12, 14, 3)[0]
    pils = np.asarray(Image.open(_io.BytesIO(payload)).convert("RGB"))
    np.testing.assert_array_equal(ours, pils)

    with pytest.raises(IOError):
        native.decode_image_batch([b"not an image"], 4, 4, 3)


def _write_tfrecord(path, payloads):
    """Hand-rolled writer using the native crc32c (independent of tf), so
    framing tests run even where tf import is slow."""
    import struct

    def mask(c):
        return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF

    with open(path, "wb") as f:
        for p in payloads:
            header = struct.pack("<Q", len(p))
            f.write(header)
            f.write(struct.pack("<I", mask(native.crc32c(header))))
            f.write(p)
            f.write(struct.pack("<I", mask(native.crc32c(p))))


def _example(image_bytes, label):
    """Minimal serialized tf.train.Example built by hand (field numbers per
    the public .proto): Example.features=1 > map entry > key=1/value=2 >
    Feature.bytes_list=1 / int64_list=3 > value=1."""

    def ld(field, payload):  # length-delimited
        return bytes([field << 3 | 2, len(payload)]) + payload \
            if len(payload) < 128 else _ld_long(field, payload)

    def _ld_long(field, payload):
        out = bytes([field << 3 | 2])
        n = len(payload)
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out + payload

    img_feat = ld(1, ld(1, image_bytes))               # BytesList.value
    lbl_feat = ld(3, bytes([1 << 3 | 0, label]))       # Int64List.value varint
    entries = (ld(1, ld(1, b"image") + ld(2, img_feat))
               + ld(1, ld(1, b"label") + ld(2, lbl_feat)))
    return ld(1, entries)


def test_tfrecord_index_and_example_walk(tmp_path):
    rng = np.random.default_rng(3)
    payloads, raws, labels = [], [], []
    for i in range(7):
        raw = rng.integers(0, 256, rng.integers(5, 200), dtype=np.uint8
                           ).tobytes()
        payloads.append(_example(raw, i))
        raws.append(raw)
        labels.append(i)
    p = str(tmp_path / "t.tfrecord")
    _write_tfrecord(p, payloads)
    offs, lens = native.tfrecord_index(p)
    assert len(offs) == 7
    blob = open(p, "rb").read()
    for i, (o, n) in enumerate(zip(offs, lens)):
        rec = blob[o:o + n]
        assert rec == payloads[i]
        assert bytes(native.example_bytes(rec, "image")) == raws[i]
        assert native.example_int64(rec, "label") == labels[i]
        # pure-Python fallbacks agree
        assert bytes(native._example_bytes_py(rec, "image", 0)) == raws[i]
        assert native._example_int64_py(rec, "label") == labels[i]
    o2, l2 = native._tfrecord_index_py(p)
    np.testing.assert_array_equal(o2, offs)
    np.testing.assert_array_equal(l2, lens)


def test_tfrecord_corruption_detected(tmp_path):
    p = str(tmp_path / "c.tfrecord")
    _write_tfrecord(p, [_example(b"abc", 0), _example(b"defg", 1)])
    blob = bytearray(open(p, "rb").read())
    offs, _ = native.tfrecord_index(p)
    blob[offs[1] + 1] ^= 0xFF  # flip a payload byte of record 2
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(IOError, match="corrupt"):
        native.tfrecord_index(bad)
    # unverified mode still indexes (framing intact)
    offs2, _ = native.tfrecord_index(bad, check_crc=False)
    assert len(offs2) == 2


def test_example_missing_key_raises():
    rec = _example(b"xy", 4)
    with pytest.raises(KeyError):
        native.example_bytes(rec, "nope")
    with pytest.raises(KeyError):
        native.example_int64(rec, "image")  # bytes feature, not int64


def test_tfrecord_dataset_native_raw_format(tmp_path):
    """End-to-end FFHQ-style pipeline: raw CHW records -> model-space
    batches, labels, determinism by seed."""
    from dpm_solver_tpu.data import tfrecord_dataset_native

    rng = np.random.default_rng(5)
    payloads = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 256, size=(3, 8, 8), dtype=np.uint8)
        imgs.append(img)
        shape_feat = (bytes([3 << 3 | 2, 6]) + bytes([1 << 3 | 0, 3])
                      + bytes([1 << 3 | 0, 8]) + bytes([1 << 3 | 0, 8]))
        # build {'shape': Int64List[3,8,8], 'data': bytes} by hand

        def ld(field, payload):  # varint-length length-delimited field
            out = bytes([field << 3 | 2])
            m = len(payload)
            while True:
                b = m & 0x7F
                m >>= 7
                out += bytes([b | (0x80 if m else 0)])
                if not m:
                    return out + payload

        data_feat = ld(1, ld(1, img.tobytes()))
        entries = (ld(1, ld(1, b"data") + ld(2, data_feat))
                   + ld(1, ld(1, b"shape") + ld(2, shape_feat)))
        payloads.append(ld(1, entries))
    p = str(tmp_path / "ffhq.tfrecord")
    _write_tfrecord(p, payloads)

    it = tfrecord_dataset_native(
        p, resolution=0, batch_size=3, image_key="data", shape_key="shape",
        centered=True, shuffle=False, repeat=False)
    batches = list(it)
    assert len(batches) == 2 and batches[0].shape == (3, 8, 8, 3)
    want = np.transpose(imgs[0], (1, 2, 0)).astype(np.float32) / 255.0
    np.testing.assert_allclose(batches[0][0], want * 2.0 - 1.0, atol=1e-6)

    # shuffled + seeded: same seed -> same order
    a = next(iter(tfrecord_dataset_native(
        p, resolution=0, batch_size=6, shape_key="shape", seed=7)))
    b = next(iter(tfrecord_dataset_native(
        p, resolution=0, batch_size=6, shape_key="shape", seed=7)))
    np.testing.assert_array_equal(a, b)


def test_tfrecord_dataset_native_encoded_format(tmp_path):
    """Prepared-TFDS-style records: encoded PNG + label -> dict batches."""
    from dpm_solver_tpu.data import tfrecord_dataset_native

    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, size=(4, 10, 10, 3), dtype=np.uint8)
    png_paths = [str(tmp_path / f"e{i}.png") for i in range(4)]
    native.write_png_batch(imgs, png_paths)

    def ld(field, payload):
        out = bytes([field << 3 | 2])
        n = len(payload)
        while True:
            byte = n & 0x7F
            n >>= 7
            out += bytes([byte | (0x80 if n else 0)])
            if not n:
                return out + payload

    payloads = []
    for i, pp in enumerate(png_paths):
        img_feat = ld(1, ld(1, open(pp, "rb").read()))
        lbl_feat = ld(3, bytes([1 << 3 | 0, i]))
        entries = (ld(1, ld(1, b"image") + ld(2, img_feat))
                   + ld(1, ld(1, b"label") + ld(2, lbl_feat)))
        payloads.append(ld(1, entries))
    p = str(tmp_path / "tfds.tfrecord")
    _write_tfrecord(p, payloads)

    it = tfrecord_dataset_native(
        p, resolution=0, batch_size=2, image_key="image", shape_key=None,
        label_key="label", shuffle=False, repeat=False)
    batch = next(iter(it))
    assert set(batch) == {"image", "label"}
    np.testing.assert_allclose(batch["image"][0],
                               imgs[0].astype(np.float32) / 255.0, atol=1e-6)
    np.testing.assert_array_equal(batch["label"], [0, 1])


def test_prefetch_iterator_propagates_and_preserves_order():
    from dpm_solver_tpu.data import prefetch_iterator

    assert list(prefetch_iterator(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("worker failed")

    it = prefetch_iterator(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="worker failed"):
        list(it)


def test_save_images_and_fid_folder_path(tmp_path):
    """The two wired consumers: cli._save_images writes through the native
    encoder; eval.fid's folder reader decodes through the native reader.
    Pixel-exact agreement with the float source."""
    from dpm_solver_tpu.cli import _save_images
    from dpm_solver_tpu.eval.fid import compute_statistics_of_path

    rng = np.random.default_rng(9)
    arr = rng.random((6, 8, 8, 3)).astype(np.float32)
    out = str(tmp_path / "samples")
    _save_images(arr, out, prefix="s")
    files = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert len(files) == 6
    back = native.read_png_batch([os.path.join(out, f) for f in files])
    np.testing.assert_array_equal(
        back, (arr * 255).clip(0, 255).astype(np.uint8))

    def feature_fn(batch):
        # identity features: stats must equal the quantized source stats
        return np.asarray(batch).reshape(len(batch), -1), None

    mu, sigma = compute_statistics_of_path(out, feature_fn, batch_size=4)
    flat = (back.astype(np.float32) / 255.0).reshape(6, -1)
    np.testing.assert_allclose(mu, flat.mean(0), atol=1e-6)
