"""ctypes binding for the native LMDB B+tree walker.

Compiles ``native/lmdb_walk.cpp`` with g++ on first use (cached by source
hash under ``$XDG_CACHE_HOME`` or /tmp) and exposes ``entry_table``: one C
pass over the mmap that returns every record's (key_off, key_len, val_off,
val_len). ``utils/lmdb.py`` uses it to serve zero-copy iteration; any
failure (no compiler, walk error) falls back to the pure-Python walk, which
remains the reference implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native",
                    "lmdb_walk.cpp")

_ERRORS = {
    -2: "B+tree too deep (cycle?)",
    -3: "corrupt page or truncated file",
    -4: "unexpected page flags",
    -5: "entry table capacity exceeded",
}

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _cache_dir() -> str:
    root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.path.join(root, "dpm_solver_tpu")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the walker; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"lmdb_walk_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, so)  # atomic vs concurrent builders
        lib = ctypes.CDLL(so)
        lib.lmdb_walk.restype = ctypes.c_longlong
        lib.lmdb_walk.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_void_p, ctypes.c_longlong,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib_failed = True
    return _lib


def entry_table(buf, psize: int, root: int,
                entries: int) -> Optional[np.ndarray]:
    """(entries, 4) uint64 table of (key_off, key_len, val_off, val_len) in
    key order, or None when the native path is unavailable.

    Raises ValueError on a corrupt file (same condition the Python walk
    would raise on)."""
    lib = load_library()
    if lib is None:
        return None
    arr = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty((max(entries, 1), 4), dtype=np.uint64)
    n = lib.lmdb_walk(
        arr.ctypes.data_as(ctypes.c_void_p), arr.size, psize, root,
        out.ctypes.data_as(ctypes.c_void_p), out.shape[0])
    if n < 0:
        raise ValueError(f"lmdb_walk: {_ERRORS.get(int(n), f'error {n}')}")
    return out[: int(n)]
