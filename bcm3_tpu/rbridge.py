"""R-bridge backend: the Python side of the R analysis interface.

The reference drives posterior-predictive evaluation from R through a
compiled shared library loaded with `.C()` (reference:
src/bcmrbridge/interface.cpp:27-89 `bcm3_rbridge_init`/`cleanup`, plus
per-likelihood accessors such as interface_popPK.cpp:41-79). Here the
model already lives in Python, so the bridge is a small registry of
model handles with the same call semantics; `R/bcm3tpu.r` exposes the
reference's exact R function names (`bcm3.init.cpp`,
`bcm3.popPK.get.likelihood`, ...) on top of this module via reticulate.

Everything in this module is plain-Python callable (numpy in / numpy
out) so the contract is testable in CI without an R runtime
(tests/test_rbridge.py); the R veneer adds no logic of its own.
"""

from __future__ import annotations

import itertools
import os
from typing import Dict, Optional

import numpy as np

_handles: Dict[str, dict] = {}
_counter = itertools.count(1)


def init(
    base_folder: str,
    prior_file: str = "prior.xml",
    likelihood_file: str = "likelihood.xml",
) -> str:
    """Build varset/prior/likelihood from the XML files, exactly like the
    reference bridge (interface.cpp:27-89). Returns an opaque handle."""
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet

    prior_path = os.path.join(base_folder, prior_file)
    lik_path = os.path.join(base_folder, likelihood_file)
    varset = VariableSet.from_xml(prior_path)
    prior = Prior.from_xml(prior_path, varset)
    lik = create_likelihood(lik_path, varset)
    handle = f"bcm3tpu_{next(_counter)}"
    _handles[handle] = {
        "varset": varset,
        "prior": prior,
        "likelihood": lik,
        "base_folder": base_folder,
    }
    return handle


def cleanup(handle: str) -> None:
    _handles.pop(handle, None)


def _get(handle: str) -> dict:
    if handle not in _handles:
        raise KeyError(f"unknown bcm3 bridge handle '{handle}'")
    return _handles[handle]


def get_variable_names(handle: str):
    return list(_get(handle)["varset"].names)


def get_log_likelihood(handle: str, param_values) -> float:
    """reference: bcm3_rbridge_popPK_get_log_likelihood and friends —
    one likelihood evaluation at the given (untransformed) values."""
    import jax.numpy as jnp

    h = _get(handle)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    return float(h["likelihood"].log_prob(vals))


def get_log_prior(handle: str, param_values) -> float:
    import jax.numpy as jnp

    h = _get(handle)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    return float(h["prior"].log_pdf(vals))


# ---------------------------------------------------------------------------
# PopPK accessors (reference: interface_popPK.cpp:41-120; R usage in
# R/evaluate_popPK.r). Arrays are returned (timepoints, patients) to match
# the R-side array(c(nt, np)) layout.


def popPK_get_observed_data(handle: str):
    m = _get(handle)["likelihood"].model
    time = np.asarray(m.trial.time, dtype=np.float64)
    data = np.asarray(m.trial.observed, dtype=np.float64).T  # (T, P)
    return {"time": time, "data": data}


def popPK_get_simulated_data(handle: str, param_values):
    m = _get(handle)["likelihood"].model
    import jax.numpy as jnp

    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    conc = np.asarray(m.simulate_trajectories(vals), dtype=np.float64).T
    time = np.asarray(m.trial.time, dtype=np.float64)
    return {"time": time, "data": conc}


# ---------------------------------------------------------------------------
# Single-patient PK / pharmaco accessors


def PK_get_simulated_trajectories(handle: str, param_values):
    m = _get(handle)["likelihood"].model
    import jax.numpy as jnp

    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    sim = np.asarray(m.simulate_trajectories(vals), dtype=np.float64)
    time = np.asarray(m.trial.time, dtype=np.float64)
    return {"time": time, "data": sim.T}


def pharmaco_get_simulation(handle: str, param_values):
    m = _get(handle)["likelihood"].model
    import jax.numpy as jnp

    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    return m.simulate(vals)


# ---------------------------------------------------------------------------
# fISA accessors (reference: interface_fISA.cpp:40-192)


def fISA_get_observed_data(handle: str, experiment_ix: int, data_ix: int):
    m = _get(handle)["likelihood"].model
    exp = m.experiments[experiment_ix]
    return np.asarray(exp.observed_data(data_ix), dtype=np.float64)
