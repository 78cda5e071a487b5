"""ctypes bindings for the native C++ components (see /root/repo/native/).

Currently: the BAL data-loader (``libbal_loader.so``).  The library is
auto-built with g++ on first use if missing or older than its source (a
stale binary must never shadow a fresh build); every caller has a pure-numpy
fallback, so the framework works without a toolchain too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_PKG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_PKG_DIR, "libbal_loader.so")
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "bal_loader.cpp",
)

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    stale = (
        os.path.exists(_SO_PATH)
        and os.path.exists(_SRC)
        and os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)
    )
    if (not os.path.exists(_SO_PATH) or stale) and os.path.exists(_SRC):
        try:
            os.makedirs(_PKG_DIR, exist_ok=True)
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-fPIC",
                    "-shared",
                    "-std=c++17",
                    _SRC,
                    "-o",
                    _SO_PATH,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.bal_sizes.restype = ctypes.c_int
    lib.bal_sizes.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int64)
    ] * 3
    lib.bal_parse.restype = ctypes.c_int
    lib.bal_parse.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def parse_bal(path: str):
    """Parse a BAL file with the native loader; returns the arrays dict or
    ``None`` when the native library is unavailable (callers fall back to
    numpy)."""
    lib = _load()
    if lib is None:
        return None
    ncam = ctypes.c_int64()
    npt = ctypes.c_int64()
    nobs = ctypes.c_int64()
    if lib.bal_sizes(path.encode(), ncam, npt, nobs) != 0:
        raise IOError(f"failed to read BAL header from {path}")
    c, p, k = ncam.value, npt.value, nobs.value
    cam_idx = np.empty(k, dtype=np.int32)
    pt_idx = np.empty(k, dtype=np.int32)
    obs = np.empty((k, 2), dtype=np.float64)
    cams = np.empty((c, 9), dtype=np.float64)
    pts = np.empty((p, 3), dtype=np.float64)
    rc = lib.bal_parse(path.encode(), cam_idx, pt_idx, obs, cams, pts)
    if rc != 0:
        raise IOError(f"native BAL parse failed (rc={rc}) for {path}")
    return dict(
        cameras=cams,
        points=pts,
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        observations=obs,
    )
