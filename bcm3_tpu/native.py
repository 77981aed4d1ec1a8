"""Loader for the native C++ runtime components.

The reference implements its runtime (thread pool, Hungarian matching,
NetCDF IO) in C++ (reference: src/utils/, the vendored
dependencies/HungarianAlgorithm-master); bcm3_tpu keeps the hot
host-side kernels native too. Libraries are built on demand with the
system toolchain (native/Makefile) and loaded through ctypes; every
caller has a pure-Python/scipy fallback so the framework works without
a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LAP_SO = os.path.join(_NATIVE_DIR, "build", "libbcm3lap.so")

_lap_lib = None
_lap_checked = False


def _build_native() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # missing toolchain, read-only fs, ...
        logger.debug("Native build failed: %s", e)
        return False


def get_lap_library() -> Optional[ctypes.CDLL]:
    """The native LAP library, building it on first use; None if
    unavailable (callers fall back to scipy)."""
    global _lap_lib, _lap_checked
    if _lap_checked:
        return _lap_lib
    _lap_checked = True
    if not os.path.exists(_LAP_SO):
        if not _build_native():
            return None
    try:
        lib = ctypes.CDLL(_LAP_SO)
        lib.bcm3_lap_solve.restype = ctypes.c_double
        lib.bcm3_lap_solve.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lap_lib = lib
    except OSError as e:
        logger.debug("Cannot load native LAP library: %s", e)
        _lap_lib = None
    return _lap_lib


def lap_solve(cost: np.ndarray):
    """Min-cost rectangular assignment of rows to columns.

    Returns (row_to_col, total_cost). Uses the native JV solver when
    available, scipy.optimize.linear_sum_assignment otherwise."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    lib = get_lap_library()
    if lib is not None and n_rows <= n_cols:
        out = np.empty(n_rows, dtype=np.int32)
        total = lib.bcm3_lap_solve(
            n_rows,
            n_cols,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if np.isfinite(total):
            return out.astype(np.int64), float(total)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.full(n_rows, -1, dtype=np.int64)
    out[rows] = cols
    return out, float(cost[rows, cols].sum())
