"""ctypes bindings for the native host-IO runtime (io.cpp).

The reference's host data plane is native: tf.data's C++ runtime decodes
TFRecords (score_sde_jax/datasets.py:103-199) and its FID protocol shuttles
50k PNGs per eval through the runner (runners/diffusion.py:450-457,
evaluate/fid_score.py:146-170). This package is our equivalent — a small
C++ library the Python layer drives through ctypes — with every entry point
mirrored by a pure-Python fallback so the framework keeps working if the
toolchain is absent (`available()` gates the fast path).

Public surface:
  available()                       -> bool
  write_png_batch(images, paths)    -> None        (uint8 NHWC batch)
  read_png_batch(paths)             -> uint8 NHWC  (uniform-size folder)
  png_probe(path)                   -> (h, w, c)
  tfrecord_index(path)              -> (offsets, lengths) int64 arrays
  example_bytes(buf, key, idx=0)    -> memoryview of the feature bytes
  example_int64(buf, key)           -> int
  crc32c(data)                      -> int  (unmasked; tests)
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            from dpm_solver_tpu.native.build import ensure_built

            lib = ctypes.CDLL(ensure_built())
        except Exception:  # noqa: BLE001 — toolchain absent => pure-Python
            _load_failed = True
            return None
        i64, u8p, ccp = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), \
            ctypes.POINTER(ctypes.c_char_p)
        i64p = ctypes.POINTER(i64)
        lib.dpm_png_write_batch.restype = ctypes.c_int
        lib.dpm_png_write_batch.argtypes = [u8p, i64, i64, i64, i64, ccp,
                                            ctypes.c_int]
        lib.dpm_png_probe.restype = ctypes.c_int
        lib.dpm_png_probe.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
        lib.dpm_png_read_batch.restype = ctypes.c_int
        lib.dpm_png_read_batch.argtypes = [ccp, i64, u8p, i64, i64, i64,
                                           ctypes.c_int]
        lib.dpm_tfrecord_index.restype = i64
        lib.dpm_tfrecord_index.argtypes = [ctypes.c_char_p, i64p, i64p, i64,
                                           ctypes.c_int]
        lib.dpm_image_probe_mem.restype = ctypes.c_int
        lib.dpm_image_probe_mem.argtypes = [u8p, i64, i64p, i64p, i64p,
                                            ctypes.POINTER(ctypes.c_int)]
        lib.dpm_decode_mem_batch.restype = ctypes.c_int
        lib.dpm_decode_mem_batch.argtypes = [u8p, i64p, i64p, i64, u8p, i64,
                                             i64, i64, ctypes.c_int]
        lib.dpm_example_find_bytes.restype = ctypes.c_int
        lib.dpm_example_find_bytes.argtypes = [u8p, i64, ctypes.c_char_p,
                                               i64, i64p, i64p]
        lib.dpm_example_find_int64.restype = ctypes.c_int
        lib.dpm_example_find_int64.argtypes = [u8p, i64, ctypes.c_char_p,
                                               i64p]
        lib.dpm_crc32c.restype = ctypes.c_uint32
        lib.dpm_crc32c.argtypes = [u8p, i64]
        _lib = lib
    return _lib


def available() -> bool:
    """True when the native library is importable (builds it on first call)."""
    return _load() is not None


def _default_threads() -> int:
    return min(16, os.cpu_count() or 1)


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ------------------------------------------------------------------ PNG


def write_png_batch(images: np.ndarray, paths: Sequence[str],
                    threads: Optional[int] = None) -> None:
    """uint8 (N,H,W,C) or (N,H,W) batch -> one PNG per path, parallel
    encode. Falls back to PIL when the native library is unavailable."""
    images = np.ascontiguousarray(images)
    if images.ndim == 3:
        images = images[..., None]
    if images.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {images.dtype}")
    n, h, w, c = images.shape
    if len(paths) != n:
        raise ValueError(f"{n} images but {len(paths)} paths")
    lib = _load()
    if lib is None:
        from PIL import Image

        for img, p in zip(images, paths):
            Image.fromarray(img.squeeze()).save(p)
        return
    fails = lib.dpm_png_write_batch(_u8ptr(images), n, h, w, c,
                                    _paths_array(paths),
                                    threads or _default_threads())
    if fails:
        raise IOError(f"png write failed for {fails}/{n} images")


def png_probe(path: str) -> Tuple[int, int, int]:
    lib = _load()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            return im.height, im.width, len(im.getbands())
    h, w, c = (ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64())
    if lib.dpm_png_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c)):
        raise IOError(f"cannot probe {path}")
    return h.value, w.value, c.value


def read_png_batch(paths: Sequence[str], channels: Optional[int] = None,
                   threads: Optional[int] = None) -> np.ndarray:
    """Decode a uniform-size PNG folder slice into a uint8 (N,H,W,C) batch
    (grayscale sources are expanded / RGB collapsed to match `channels`)."""
    if not paths:
        return np.zeros((0, 0, 0, 0), np.uint8)
    h, w, c0 = png_probe(paths[0])
    c = channels or c0
    lib = _load()
    if lib is None:
        from PIL import Image

        mode = {1: "L", 3: "RGB", 4: "RGBA"}[c]
        out = np.stack([
            np.asarray(Image.open(p).convert(mode)) for p in paths])
        return out[..., None] if out.ndim == 3 else out
    out = np.empty((len(paths), h, w, c), np.uint8)
    fails = lib.dpm_png_read_batch(_paths_array(paths), len(paths),
                                   _u8ptr(out), h, w, c,
                                   threads or _default_threads())
    if fails:
        raise IOError(f"png read failed for {fails}/{len(paths)} files "
                      f"(mixed sizes? first file is {h}x{w})")
    return out


def image_probe_mem(data: bytes) -> Tuple[int, int, int, str]:
    """(h, w, c, kind) of an in-memory encoded PNG/JPEG payload."""
    lib = _load()
    if lib is None:
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(bytes(data))) as im:
            return im.height, im.width, len(im.getbands()), \
                im.format.lower() if im.format else "unknown"
    arr = np.frombuffer(data, np.uint8)
    h, w, c = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
    kind = ctypes.c_int()
    if lib.dpm_image_probe_mem(_u8ptr(arr), arr.size, ctypes.byref(h),
                               ctypes.byref(w), ctypes.byref(c),
                               ctypes.byref(kind)):
        raise IOError("cannot probe encoded image")
    return h.value, w.value, c.value, {1: "png", 2: "jpeg"}.get(kind.value,
                                                                "unknown")


def decode_image_batch(payloads: Sequence[bytes], h: int, w: int, c: int,
                       threads: Optional[int] = None) -> np.ndarray:
    """Decode in-memory PNG/JPEG payloads (all HxW, normalized to c
    channels) into a uint8 (N,H,W,C) batch on a thread pool — the native
    twin of tf.image.decode_image in the reference's input pipeline
    (score_sde_jax/datasets.py:139). JPEG sources require c in {1, 3}."""
    n = len(payloads)
    if n == 0:
        return np.zeros((0, h, w, c), np.uint8)
    lib = _load()
    if lib is None:
        import io as _io

        from PIL import Image

        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[c]
        return np.stack([
            np.asarray(Image.open(_io.BytesIO(bytes(p))).convert(mode))
            .reshape(h, w, c) for p in payloads])
    lens = np.asarray([len(p) for p in payloads], np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    blob = np.frombuffer(b"".join(bytes(p) for p in payloads), np.uint8)
    out = np.empty((n, h, w, c), np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    fails = lib.dpm_decode_mem_batch(
        _u8ptr(blob), offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
        n, _u8ptr(out), h, w, c, threads or _default_threads())
    if fails:
        raise IOError(f"in-memory decode failed for {fails}/{n} payloads "
                      f"(mixed sizes, or JPEG with c not in {{1,3}}?)")
    return out


# ------------------------------------------------------------- TFRecord


def tfrecord_index(path: str, check_crc: bool = True
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Payload (offsets, lengths) of every record in a TFRecord file,
    CRC32C-verified. Raises on framing/CRC corruption with the byte
    position. Pure-Python fallback parses the same framing (unverified
    payload CRC for speed)."""
    lib = _load()
    if lib is None:
        return _tfrecord_index_py(path)
    size = os.path.getsize(path)
    cap = max(1, size // 16)  # every record costs >= 16 framing+payload bytes
    offsets = np.empty(cap, np.int64)
    lengths = np.empty(cap, np.int64)
    n = lib.dpm_tfrecord_index(
        path.encode(), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap,
        1 if check_crc else 0)
    if n < 0:
        raise IOError(f"corrupt TFRecord {path} at byte {-n - 1}")
    return offsets[:n].copy(), lengths[:n].copy()


def _tfrecord_index_py(path: str) -> Tuple[np.ndarray, np.ndarray]:
    import struct

    offsets, lengths = [], []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            header = f.read(12)
            if len(header) < 12:
                raise IOError(f"corrupt TFRecord {path} at byte {pos}")
            (length,) = struct.unpack("<Q", header[:8])
            offsets.append(pos + 12)
            lengths.append(length)
            f.seek(length + 4, os.SEEK_CUR)
            pos += 12 + length + 4
    return np.asarray(offsets, np.int64), np.asarray(lengths, np.int64)


def example_bytes(buf, key: str, idx: int = 0) -> memoryview:
    """The idx-th bytes value of feature `key` in a serialized
    tf.train.Example (zero-copy view into `buf`)."""
    data = np.frombuffer(buf, np.uint8)
    lib = _load()
    if lib is None:
        return _example_bytes_py(bytes(buf), key, idx)
    off, blen = ctypes.c_int64(), ctypes.c_int64()
    if lib.dpm_example_find_bytes(_u8ptr(data), data.size, key.encode(), idx,
                                  ctypes.byref(off), ctypes.byref(blen)):
        raise KeyError(f"no bytes feature {key!r}[{idx}] in Example")
    return memoryview(buf)[off.value:off.value + blen.value]


def example_int64(buf, key: str) -> int:
    data = np.frombuffer(buf, np.uint8)
    lib = _load()
    if lib is None:
        return _example_int64_py(bytes(buf), key)
    val = ctypes.c_int64()
    if lib.dpm_example_find_int64(_u8ptr(data), data.size, key.encode(),
                                  ctypes.byref(val)):
        raise KeyError(f"no int64 feature {key!r} in Example")
    return val.value


def crc32c(data: bytes) -> int:
    lib = _load()
    arr = np.frombuffer(data, np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.dpm_crc32c(_u8ptr(arr), arr.size))


# ------------------------------------------- pure-Python Example fallback


def _varint(b: bytes, i: int) -> Tuple[int, int]:
    v, shift = 0, 0
    while True:
        byte = b[i]
        v |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return v, i
        shift += 7


def _walk_fields(b: bytes, start: int, end: int):
    i = start
    while i < end:
        tag, i = _varint(b, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _varint(b, i)
            yield field, wire, v, None, None
        elif wire == 2:
            n, i = _varint(b, i)
            yield field, wire, None, i, i + n
            i += n
        elif wire == 1:
            i += 8
            yield field, wire, None, None, None
        elif wire == 5:
            i += 4
            yield field, wire, None, None, None
        else:
            raise ValueError(f"bad wire type {wire}")


def _find_feature_py(b: bytes, key: str):
    kb = key.encode()
    for f, wire, _, s, e in _walk_fields(b, 0, len(b)):
        if f == 1 and wire == 2:
            for ff, fw, _, es, ee in _walk_fields(b, s, e):
                if ff == 1 and fw == 2:
                    ks = vs = None
                    for ef, ew, _, ps, pe in _walk_fields(b, es, ee):
                        if ef == 1 and ew == 2:
                            ks = b[ps:pe]
                        elif ef == 2 and ew == 2:
                            vs = (ps, pe)
                    if ks == kb and vs:
                        return vs
    return None


def _example_bytes_py(b: bytes, key: str, idx: int) -> memoryview:
    span = _find_feature_py(b, key)
    if span:
        for f, wire, _, s, e in _walk_fields(b, *span):
            if f == 1 and wire == 2:  # BytesList
                seen = 0
                for lf, lw, _, bs, be in _walk_fields(b, s, e):
                    if lf == 1 and lw == 2:
                        if seen == idx:
                            return memoryview(b)[bs:be]
                        seen += 1
    raise KeyError(f"no bytes feature {key!r}[{idx}] in Example")


def _example_int64_py(b: bytes, key: str) -> int:
    span = _find_feature_py(b, key)
    if span:
        for f, wire, _, s, e in _walk_fields(b, *span):
            if f == 3 and wire == 2:  # Int64List
                for lf, lw, v, bs, be in _walk_fields(b, s, e):
                    if lf == 1 and lw == 0:
                        return v
                    if lf == 1 and lw == 2:  # packed
                        val, _ = _varint(b, bs)
                        return val
    raise KeyError(f"no int64 feature {key!r} in Example")
