"""Pure-Python LMDB reader/writer + LSUN pipeline.

The reference reads LSUN from LMDB via the C library
(ddpm_and_guided-diffusion/datasets/lsun.py:12-58); ours parses the on-disk
format directly. The writer/reader pair is validated hermetically (round
trips across page-layout regimes: single leaf, multi-leaf + branch levels,
overflow values) plus structural checks of the emitted meta pages against
the documented mdb.c layout.
"""

import io
import os
import struct

import numpy as np
import pytest

from dpm_solver_tpu.utils.lmdb import (
    LMDBError,
    LMDBReader,
    MAGIC,
    P_INVALID,
    write_lmdb,
)


def roundtrip(tmp_path, items, name="db"):
    path = write_lmdb(str(tmp_path / name), dict(items).items())
    return LMDBReader(path)


def test_empty_db(tmp_path):
    r = roundtrip(tmp_path, [])
    assert len(r) == 0
    assert list(r.items()) == []
    assert r.get(b"missing") is None
    assert r.stat()["entries"] == 0


def test_single_leaf_roundtrip(tmp_path):
    items = {f"k{i:03d}".encode(): f"value-{i}".encode() for i in range(20)}
    r = roundtrip(tmp_path, items)
    assert len(r) == 20
    assert dict(r.items()) == items
    # key order is bytewise-sorted, as the real cursor yields
    ks = r.keys()
    assert ks == sorted(ks)
    assert r.stat()["depth"] == 1
    assert r.stat()["leaf_pages"] == 1
    for k, v in items.items():
        assert r.get(k) == v
    assert r.get(b"zzz") is None
    assert b"k000" in r and b"nope" not in r


def test_multi_page_branch_tree(tmp_path):
    # ~2000 entries * ~60 B nodes >> one 4 KiB page -> real branch levels
    rng = np.random.default_rng(0)
    items = {
        f"{i:08d}".encode(): bytes(rng.integers(0, 256, 40, dtype=np.uint8))
        for i in rng.choice(10**7, 2000, replace=False)
    }
    r = roundtrip(tmp_path, items)
    st = r.stat()
    assert st["entries"] == 2000
    assert st["depth"] >= 2 and st["branch_pages"] >= 1 and st["leaf_pages"] > 1
    assert dict(r.items()) == items
    for k in list(items)[::97]:
        assert r.get(k) == items[k]
    # point lookups through the branch search must agree with iteration
    assert r.get(min(items)) == items[min(items)]
    assert r.get(max(items)) == items[max(items)]
    assert r.get(b"~~~~") is None  # beyond every key


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(1)
    items = {
        b"small": b"x" * 10,
        b"one-page": bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        b"many-pages": bytes(rng.integers(0, 256, 100_000, dtype=np.uint8)),
    }
    r = roundtrip(tmp_path, items)
    assert r.stat()["overflow_pages"] >= 2 + 25
    assert dict(r.items()) == items
    assert r.get(b"many-pages") == items[b"many-pages"]


def test_meta_page_layout(tmp_path):
    """The emitted file carries valid meta pages at the documented offsets."""
    path = write_lmdb(str(tmp_path / "db"), {b"a": b"1"}.items())
    buf = open(path, "rb").read()
    psize = struct.unpack_from("<I", buf, 16 + 16 + 8)[0]  # mm_dbs[0].md_pad
    assert psize == 4096
    for base in (0, psize):
        assert struct.unpack_from("<H", buf, base + 10)[0] & 0x08  # P_META
        magic, version = struct.unpack_from("<II", buf, base + 16)
        assert magic == MAGIC and version == 1
    # newest meta (txnid) must carry the real root, not P_INVALID
    root = struct.unpack_from("<Q", buf, psize + 16 + 24 + 48 + 40)[0]
    assert root != P_INVALID


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "junk.mdb"
    p.write_bytes(b"\x00" * 8192)
    with pytest.raises(LMDBError):
        LMDBReader(str(p))


def test_env_directory_convention(tmp_path):
    """Both writer and reader accept an environment *directory* (data.mdb
    inside), like lmdb.open(root) in the reference loader."""
    env = tmp_path / "lsun_cat_train_lmdb"
    env.mkdir()
    write_lmdb(str(env), {b"k": b"v"}.items())
    assert os.path.exists(env / "data.mdb")
    assert LMDBReader(str(env)).get(b"k") == b"v"


def test_lsun_dataset_pipeline(tmp_path):
    """LMDB of encoded images -> batched, cropped, scaled tensors."""
    pytest.importorskip("tensorflow")
    from PIL import Image

    from dpm_solver_tpu.data import lsun_dataset, numpy_iterator

    rng = np.random.default_rng(2)
    items = {}
    for i in range(6):
        h, w = int(rng.integers(40, 80)), int(rng.integers(40, 80))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        bio = io.BytesIO()
        Image.fromarray(arr).save(bio, format="PNG")
        items[f"img{i}".encode()] = bio.getvalue()
    env = tmp_path / "bedroom_train_lmdb"
    write_lmdb(str(env), items.items())

    ds = lsun_dataset(str(env), resolution=32, batch_size=2, centered=True,
                      random_flip=False, shuffle=False, repeat=True)
    batch = next(numpy_iterator(ds))
    assert batch.shape == (2, 32, 32, 3)
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    assert np.std(batch) > 0.1  # real image content survived the trip


def test_reader_context_manager_and_keys_only_walk(tmp_path):
    items = {f"k{i:04d}".encode(): b"v" * 2000 for i in range(300)}
    path = write_lmdb(str(tmp_path / "db"), items.items())
    with LMDBReader(path) as r:
        ks = r.keys()
        assert ks == sorted(items)
    assert r._buf is None  # closed
    r.close()  # idempotent


# ---------------------------------------------------------------------------
# native walker (native/lmdb_walk.cpp via utils/lmdb_native.py)
# ---------------------------------------------------------------------------


def _native_available():
    from dpm_solver_tpu.utils import lmdb_native

    return lmdb_native.load_library() is not None


requires_gxx = pytest.mark.skipif(not _native_available(),
                                  reason="no C++ toolchain")


@requires_gxx
def test_native_walk_matches_python(tmp_path):
    """The C walker's entry table reproduces the Python walk exactly across
    the page-layout regimes (multi-level branch tree + overflow values)."""
    rs = np.random.RandomState(0)
    items = {f"k{i:06d}".encode(): rs.bytes(rs.randint(1, 300))
             for i in range(3000)}
    items[b"big0"] = rs.bytes(100_000)  # overflow pages
    items[b"big1"] = rs.bytes(9_000)
    path = write_lmdb(str(tmp_path / "db"), sorted(items.items()))
    with LMDBReader(path) as r:
        table = r.entry_table()
        assert table is not None and table.shape == (len(items), 4)
        native = [(bytes(k), bytes(v)) for k, v in r.items()]
        python = list(r._walk(r._main[7]))
    assert len(native) == len(python) == len(items)
    for (nk, nv), (pk, pv) in zip(native, python):
        assert nk == bytes(pk) and nv == bytes(pv)


@requires_gxx
def test_native_walk_rejects_corrupt_tree(tmp_path):
    """A root pointing at a non-tree page errors instead of reading junk."""
    path = write_lmdb(str(tmp_path / "db"), {b"a": b"1"}.items())
    r = LMDBReader(path)
    r._main = list(r._main)
    r._main[7] = 10**6  # page far beyond EOF
    with pytest.raises(LMDBError):
        r.entry_table()
    r.close()


@requires_gxx
def test_native_iteration_throughput(tmp_path):
    """The native table walk must not be slower than the Python parse on a
    many-record database (it is typically 10-50x faster)."""
    import time

    rs = np.random.RandomState(1)
    items = {f"key{i:07d}".encode(): rs.bytes(64) for i in range(20_000)}
    path = write_lmdb(str(tmp_path / "db"), sorted(items.items()))
    with LMDBReader(path) as r:
        t0 = time.perf_counter()
        n_native = sum(1 for _ in r.items())
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_python = sum(1 for _ in r._walk(r._main[7]))
        t_python = time.perf_counter() - t0
    assert n_native == n_python == len(items)
    assert t_native < t_python * 1.5  # generous: CI noise
