"""Native (C++) geometry hot paths with on-demand compilation.

``fastgeo.cpp`` is compiled once per environment (cached next to the
source) and bound through ctypes — no pybind11 required. Every entry point
degrades gracefully to the pure-Python implementation when no compiler is
available, and the native results are differential-tested against the
Python source of truth (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["get_lib", "native_available", "parse_dat_native",
           "raster_mask_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastgeo.cpp")
_SO = os.path.join(_DIR, "libfastgeo.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False

FIX_LEDNICER = 1
FIX_LE_DEDUP = 2
FIX_WINDING = 4


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        out = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info("native build unavailable: %s", e)
        return False
    if out.returncode != 0:
        logger.warning("native build failed: %s", out.stderr.decode()[:500])
        return False
    return True


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        lib.parse_dat.restype = ctypes.c_int32
        lib.parse_dat.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.raster_mask.restype = None
        lib.raster_mask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def parse_dat_native(text: str):
    """Native .dat parse; returns (coords, fixes) with the reference's
    fix-message contract, or None when the native library is unavailable
    or the input is rejected there (caller falls back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="ignore")
    max_out = 4096
    out = np.empty((max_out, 2), np.float64)
    counters = (ctypes.c_int32 * 5)()
    n = lib.parse_dat(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_out, counters)
    if n < 0:
        from airfoil_tpu.geometry.parser import AirfoilParseError

        n_valid = -n - 1
        raise AirfoilParseError(
            f"Insufficient valid coordinates. Found {n_valid} points.",
            code="too_few_points")
    skipped_non_coord, skipped_range, flags, n_up, n_lo = (
        counters[0], counters[1], counters[2], counters[3], counters[4])
    coords = [[float(x), float(y)] for x, y in out[:n]]

    fixes = []
    if skipped_non_coord:
        fixes.append(
            f"Non-coordinate lines skipped: {skipped_non_coord} "
            f"header/comment line(s) removed")
    if skipped_range:
        fixes.append(
            f"Out-of-range points filtered: {skipped_range} "
            f"point(s) outside valid bounds removed")
    if flags & FIX_LEDNICER:
        fixes.append(
            f"Lednicer format detected and converted: two-section format "
            f"({n_up} upper + {n_lo} lower points) merged into "
            f"a single Selig-format loop for XFOIL")
    if flags & FIX_LE_DEDUP:
        fixes.append(
            "Duplicate leading-edge point removed from Lednicer lower section")
    if flags & FIX_WINDING:
        fixes.append(
            "Winding order corrected: coordinates were in reversed order "
            "(TE→lower→LE→upper→TE) and have been reversed to the correct "
            "Selig order (TE→upper→LE→lower→TE)")
    if not fixes:
        fixes = ["No changes made — file was already in valid Selig format"]
    return coords, fixes


def raster_mask_native(xp, yp, nx: int, ny: int, domain) -> np.ndarray | None:
    """Native scanline rasterisation; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xp = np.ascontiguousarray(xp, np.float64)
    yp = np.ascontiguousarray(yp, np.float64)
    mask = np.zeros((ny, nx), np.float32)
    dx0, dx1, dy0, dy1 = domain
    lib.raster_mask(
        xp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(xp), nx, ny, dx0, dx1, dy0, dy1,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return mask
