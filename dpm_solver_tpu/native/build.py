"""Lazy g++ build of the native host-IO library (io.cpp -> libdpmio.so).

No pybind11 in this image, so the binding layer is ctypes (native/__init__)
over a plain C ABI. The .so is compiled on first use and cached next to the
source keyed by a content hash, so editing io.cpp transparently rebuilds and
shipping wheels is a non-goal (this repo is the deployment unit)."""

from __future__ import annotations

import hashlib
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "io.cpp")


def _build_dir() -> str:
    d = os.environ.get("DPM_NATIVE_CACHE",
                       os.path.join(_HERE, "_build"))
    os.makedirs(d, exist_ok=True)
    return d


def lib_path() -> str:
    with open(SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_build_dir(), f"libdpmio-{digest}.so")


def ensure_built(quiet: bool = True) -> str:
    """Compile io.cpp if its hash-keyed .so is absent; returns the path.
    Raises CalledProcessError/OSError on toolchain failure (callers treat
    any exception as 'native unavailable' and fall back to pure Python)."""
    out = lib_path()
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-pthread",
           SRC, "-o", out + ".tmp", "-lpng", "-ljpeg", "-lz"]
    subprocess.run(cmd, check=True,
                   capture_output=quiet)
    os.replace(out + ".tmp", out)  # atomic vs concurrent builders
    return out


if __name__ == "__main__":
    print(ensure_built(quiet=False))
