"""Sampler-state checkpointing.

The reference has NO mid-run checkpointing — a crashed run leaves only
the incrementally-synced NetCDF store and cannot resume
(reference: SampleHandlerNetCDF.cpp:103-106; SURVEY §5). This module
adds the true checkpoint/resume the reference lacks: the full sampler
state — chain positions, log-densities, acceptance statistics, the
device history ring buffer, RNG keys, stacked proposal arrays, block
structure, spectral-clustering assigner and progress counters — is
serialized atomically so a run can continue exactly where it stopped.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import numpy as np

CHECKPOINT_VERSION = 1


def _tree_to_numpy(tree):
    import jax

    def to_np(x):
        if not getattr(x, "is_fully_addressable", True):
            # multi-process run: gather globally-sharded leaves so every
            # process writes a complete, identical checkpoint
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(to_np, tree)


def save_checkpoint(
    path: str,
    state,
    proposals,
    blocks,
    emitted: int,
    adaptations_done: int,
    adaptation_iteration: int,
    assigner=None,
    extra: Optional[Dict[str, Any]] = None,
):
    """Atomically write a checkpoint (tmp file + rename)."""
    payload = {
        "version": CHECKPOINT_VERSION,
        "state": _tree_to_numpy(state),
        "proposals": [_tree_to_numpy(p) for p in proposals],
        "blocks": [np.asarray(b) for b in blocks],
        "emitted": int(emitted),
        "adaptations_done": int(adaptations_done),
        "adaptation_iteration": int(adaptation_iteration),
        "assigner": _tree_to_numpy(assigner) if assigner is not None else None,
        "extra": extra or {},
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != CHECKPOINT_VERSION:
        raise ValueError(
            f"Unsupported checkpoint version {payload.get('version')}"
        )
    return payload
