"""ctypes bridge to the native (C++) weight-table builder.

Compiled lazily on first use with the system compiler — the same
JIT-compile-on-demand workflow the reference uses for its C++ extensions
(torch.utils.cpp_extension.load, test.py:322) — and cached next to the
package.  Falls back silently to the numpy implementation when no compiler
is available; results are bit-identical (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["native_available", "compute_tables_native", "FILTER_IDS"]

FILTER_IDS = {
    "bilinear": 0,
    "linear": 0,
    "triangle": 0,
    "box": 1,
    "nearest": 1,
    "bicubic": 2,
    "cubic": 2,
    "lanczos3": 3,
    "bicubic075": 4,
    "hamming": 5,
}

_lock = threading.Lock()
_lib = None
_tried = False


def _src_path() -> Path:
    return Path(__file__).resolve().parent.parent / "csrc" / "aa_tables.cpp"


def _so_path() -> Path:
    cache = Path(
        os.environ.get("IA_TPU_CACHE", Path.home() / ".cache" / "ia_tpu")
    )
    cache.mkdir(parents=True, exist_ok=True)
    return cache / "libaa_tables.so"


def _build() -> Path | None:
    src, so = _src_path(), _so_path()
    if not src.exists():
        return so if so.exists() else None
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(src), "-o", str(so)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return so
        except Exception:
            continue
    return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("IA_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.aa_ntaps.restype = ctypes.c_int32
        lib.aa_ntaps.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int32, ctypes.c_int32]
        lib.aa_compute_tables_v2.restype = None
        lib.aa_compute_tables_v2.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def compute_tables_native(
    in_size: int,
    out_size: int,
    mode: str,
    antialias: bool = True,
    align_corners: bool = False,
):
    """Native float64 tables ``(xmin, size, weights)`` or None if no lib."""
    lib = _load()
    if lib is None:
        return None
    # Same mode/border mapping as ops.weights.make_axis_spec: the classic
    # (non-AA) bicubic is Keys a=-0.75 with replicate borders.
    if not antialias and FILTER_IDS.get(mode) == 2:
        mode = "bicubic075"
    border = 0 if antialias else 1
    fid = FILTER_IDS[mode]
    ntaps = lib.aa_ntaps(in_size, out_size, fid, int(antialias), int(align_corners))
    xmin = np.empty(out_size, np.int32)
    size = np.empty(out_size, np.int32)
    w = np.empty((out_size, ntaps), np.float64)
    lib.aa_compute_tables_v2(
        in_size, out_size, fid, int(antialias), int(align_corners), border,
        xmin, size, w,
    )
    return xmin, size, w
