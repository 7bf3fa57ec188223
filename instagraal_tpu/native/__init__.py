"""Native (C++) accelerators, loaded via ctypes with graceful fallback.

The shared library is built on demand with g++ (no pybind11/pip build
step needed); callers must handle `None` from load_pairs_scan() and fall
back to the pure-Python implementations. Disable entirely with
INSTAGRAAL_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

from ..log import logger

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libpairs_scan.so"
_SRC = _DIR / "pairs_scan.cpp"

_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-lz", "-o", str(_SO),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.debug("native build failed to run: %s", e)
        return False
    if res.returncode != 0:
        logger.debug("native build failed: %s", res.stderr.decode()[:500])
        return False
    return True


def load_pairs_scan():
    """Return the pairs_scan C function or None when unavailable."""
    global _lib, _tried
    if os.environ.get("INSTAGRAAL_TPU_NATIVE") == "0":
        return None
    if _lib is not None:
        return _lib.pairs_scan
    if _tried:
        return None
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        logger.debug("native load failed: %s", e)
        return None
    lib.pairs_scan.restype = ctypes.c_int64
    lib.pairs_scan.argtypes = [
        ctypes.c_char_p,  # path
        ctypes.c_char_p,  # chrom blob
        ctypes.c_int32,  # n_chroms
        ctypes.POINTER(ctypes.c_int64),  # starts
        ctypes.POINTER(ctypes.c_int64),  # starts_per_chrom
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,  # col indices
        ctypes.POINTER(ctypes.c_int64),  # out_keys
        ctypes.POINTER(ctypes.c_int64),  # out_counts
        ctypes.c_int64,  # capacity
        ctypes.POINTER(ctypes.c_int64),  # total_pairs
    ]
    _lib = lib
    return lib.pairs_scan
