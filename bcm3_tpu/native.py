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
        if hasattr(lib, "bcm3_lap_match_logp_batch"):
            lib.bcm3_lap_match_logp_batch.restype = None
            lib.bcm3_lap_match_logp_batch.argtypes = [
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
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


def lap_match_logp_batch(cost_logp: np.ndarray, obs_valid: np.ndarray,
                         sim_valid: np.ndarray,
                         n_threads: int = 0) -> np.ndarray:
    """Batched masked matched-logp: for each of B (n_obs, n_sim)
    log-likelihood matrices, Hungarian-match valid observed rows to
    valid simulated columns and return the maximized total logp
    (reference semantics: DataLikelihoodTimeCourse.cpp:187-355 /
    DataLikelihoodTimePoints.cpp:200-289). Rows with no valid obs give
    0.0; rows with fewer valid sims than obs give -inf.

    One GIL-releasing native call for the whole batch (C++ threads
    inside, ``n_threads=0`` -> all cores); falls back to a per-row
    Python loop over the single-problem solver when the shared library
    is unavailable.
    """
    cost = np.ascontiguousarray(cost_logp, dtype=np.float64)
    ov = np.ascontiguousarray(obs_valid, dtype=np.uint8)
    sv = np.ascontiguousarray(sim_valid, dtype=np.uint8)
    B, n_obs, n_sim = cost.shape
    if B == 0:
        return np.empty(0, dtype=np.float64)
    lib = get_lap_library()
    if lib is not None and hasattr(lib, "bcm3_lap_match_logp_batch"):
        if n_threads <= 0:
            n_threads = int(os.environ.get("BCM3_MATCH_THREADS", "0"))
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 16)
        totals = np.empty(B, dtype=np.float64)
        lib.bcm3_lap_match_logp_batch(
            B, n_obs, n_sim,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ov.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_threads,
            totals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return totals
    # scipy/python fallback: same semantics, one problem at a time
    totals = np.empty(B, dtype=np.float64)
    for b in range(B):
        oi = np.where(ov[b])[0]
        si = np.where(sv[b])[0]
        if len(oi) == 0:
            totals[b] = 0.0
            continue
        if len(si) < len(oi):
            totals[b] = -np.inf
            continue
        sub = cost[b][np.ix_(oi, si)]
        sub = np.where(np.isfinite(sub), sub, -1e100)
        _, neg_total = lap_solve(-sub)
        t = -neg_total
        totals[b] = t if (np.isfinite(t) and t > -1e90) else -np.inf
    return totals
