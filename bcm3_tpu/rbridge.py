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


def _fisa(handle: str):
    return _get(handle)["likelihood"].model


def fISA_get_observed_data(handle: str, experiment_ix: int, data_ix: int):
    exp = _fisa(handle).experiments[experiment_ix]
    return np.asarray(exp.observed_data(data_ix), dtype=np.float64)


def fISA_get_modeled_activities(handle: str, experiment_ix: int, param_values):
    """Steady-state signaling activities per (cell line, node) —
    reference: interface_fISA.cpp get_modeled_activities."""
    import jax.numpy as jnp

    lik = _fisa(handle)
    tv = lik._transform(jnp.asarray(np.asarray(param_values, dtype=np.float64)))
    exp = lik.experiments[experiment_ix]
    return np.asarray(exp.modeled_activities(tv), dtype=np.float64)


def fISA_get_modeled_data(
    handle: str, experiment_ix: int, data_ix: int, param_values
):
    """Model-predicted observables for one data part —
    reference: interface_fISA.cpp get_modeled_data."""
    import jax.numpy as jnp

    lik = _fisa(handle)
    tv = lik._transform(jnp.asarray(np.asarray(param_values, dtype=np.float64)))
    exp = lik.experiments[experiment_ix]
    return np.asarray(exp.modeled_data(tv, data_ix), dtype=np.float64)


def fISA_get_num_experiments(handle: str) -> int:
    return len(_fisa(handle).experiments)


def fISA_get_num_data(handle: str, experiment_ix: int) -> int:
    return len(_fisa(handle).experiments[experiment_ix].data_parts)


def fISA_get_num_cell_lines(handle: str, experiment_ix: int) -> int:
    return len(_fisa(handle).experiments[experiment_ix].cell_lines)


def fISA_get_cell_line_names(handle: str, experiment_ix: int):
    return list(_fisa(handle).experiments[experiment_ix].cell_lines)


# ---------------------------------------------------------------------------
# popPK full-trajectory accessor (reference: interface_popPK.cpp:79-120
# returns compartment trajectories alongside concentrations)


def popPK_get_simulated_trajectories(handle: str, param_values):
    """{time (T,), concentrations (T, P) nM, trajectories (n, T, P) mg}
    matching the reference's array layouts."""
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    conc, states = m.simulate_states(vals)
    time = np.asarray(m.trial.time, dtype=np.float64)
    return {
        "time": time,
        "concentrations": np.asarray(conc, dtype=np.float64).T,  # (T, P)
        "trajectories": np.asarray(states, dtype=np.float64).transpose(
            2, 1, 0
        ),  # (n, T, P)
    }


# ---------------------------------------------------------------------------
# ODE template accessor (reference: interface_ODE.cpp:56-78)


def ODE_get_simulated_trajectories(handle: str, param_values):
    """(4, 100) trajectory matrix matching the reference's fixed layout
    (interface_ODE.cpp:70-76 out_values[j*100+i] = simtraj(j, i))."""
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    ys, _ok = m.simulate(vals)
    return np.asarray(ys, dtype=np.float64).T  # (4, 100)


# ---------------------------------------------------------------------------
# Pharmaco single-patient accessors
# (reference: interface_pharmaco_single.cpp:40-152)


def pharmacosingle_get_observed_data(handle: str):
    m = _get(handle)["likelihood"].model
    t, y = m.observed()
    return {"time": np.asarray(t, dtype=np.float64),
            "data": np.asarray(y, dtype=np.float64)}


def pharmacosingle_get_simulated_data(handle: str, param_values):
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    conc, _ = m.simulate(vals)
    t, _ = m.observed()
    return {"time": np.asarray(t, dtype=np.float64),
            "data": np.asarray(conc, dtype=np.float64)}


def pharmacosingle_get_simulated_trajectory(handle: str, param_values, timepoints):
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    conc, traj, ok = m.simulate_trajectory(vals, timepoints)
    return {
        "time": np.asarray(timepoints, dtype=np.float64),
        "concentrations": np.asarray(conc, dtype=np.float64),
        "trajectories": np.asarray(traj, dtype=np.float64).T,  # (n_comp, T)
        "ok": bool(ok),
    }


# ---------------------------------------------------------------------------
# Pharmaco population accessors
# (reference: interface_pharmaco_population.cpp:40-190)


def pharmacopop_get_num_patients(handle: str) -> int:
    return int(_get(handle)["likelihood"].model.num_patients)


def pharmacopop_get_observed_data(handle: str, patient_ix: int):
    m = _get(handle)["likelihood"].model
    t, y = m.observed(patient_ix)
    return {"time": np.asarray(t, dtype=np.float64),
            "data": np.asarray(y, dtype=np.float64)}


def pharmacopop_get_simulated_data(handle: str, param_values, patient_ix: int):
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    t, _ = m.observed(patient_ix)
    conc, _, _ = m.simulate_patient_trajectory(vals, patient_ix, t)
    return {"time": np.asarray(t, dtype=np.float64),
            "data": np.asarray(conc, dtype=np.float64)}


def pharmacopop_get_simulated_trajectory(
    handle: str, param_values, patient_ix: int, timepoints
):
    import jax.numpy as jnp

    m = _get(handle)["likelihood"].model
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    conc, traj, ok = m.simulate_patient_trajectory(vals, patient_ix, timepoints)
    return {
        "time": np.asarray(timepoints, dtype=np.float64),
        "concentrations": np.asarray(conc, dtype=np.float64),
        "trajectories": np.asarray(traj, dtype=np.float64).T,
        "ok": bool(ok),
    }


# ---------------------------------------------------------------------------
# Incucyte accessors (reference: interface_incucyte.cpp:40-122)


def incucyte_get_simulated_trajectories(
    handle: str, param_values, experiment_ix: int
):
    """The five well matrices (n_wells, T) the reference exposes, keyed by
    name; wells are ordered [negative, positive, drug_0..]."""
    import jax.numpy as jnp

    lik = _get(handle)["likelihood"]
    m = getattr(lik, "model", lik)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    sim = m.simulate_experiment(vals, m.experiments[experiment_ix])
    return {
        k: np.asarray(sim[k], dtype=np.float64)
        for k in (
            "cell_count",
            "apoptotic_cell_count",
            "debris",
            "confluence",
            "apoptosis_marker",
        )
    }


def incucyte_get_simulated_ctb(handle: str, param_values, experiment_ix: int):
    import jax.numpy as jnp

    lik = _get(handle)["likelihood"]
    m = getattr(lik, "model", lik)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    sim = m.simulate_experiment(vals, m.experiments[experiment_ix])
    return np.asarray(sim["ctb"], dtype=np.float64)


# ---------------------------------------------------------------------------
# Cellpop accessors (reference: interface_cellpop.cpp:45-418)


def _cellpop(handle: str):
    lik = _get(handle)["likelihood"]
    return getattr(lik, "model", lik)


def cellpop_get_num_species(handle: str, experiment=None) -> int:
    return int(_cellpop(handle).get_experiment(experiment).num_species)


def cellpop_get_species_names(handle: str, experiment=None):
    return list(_cellpop(handle).get_experiment(experiment).species_names)


def cellpop_get_num_data(handle: str, experiment=None) -> int:
    return len(_cellpop(handle).get_experiment(experiment).data_likelihoods)


def cellpop_get_simulated_trajectories(
    handle: str, param_values, experiment=None, n_timepoints: int = 500
):
    """{time (T,), values (cells, T, species), parents (cells,)}."""
    import jax.numpy as jnp

    m = _cellpop(handle)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    t, v, parents = m.simulated_trajectories(
        vals, experiment, n_timepoints=n_timepoints
    )
    return {"time": t, "values": v, "parents": parents}


def cellpop_get_observed_data(handle: str, data_ix: int, experiment=None):
    """{time, values} of one data likelihood's observations."""
    exp = _cellpop(handle).get_experiment(experiment)
    dl = exp.data_likelihoods[data_ix]
    tp = getattr(dl, "timepoints", None)
    return {
        "time": np.asarray(tp, dtype=np.float64) if tp is not None else np.zeros(1),
        "values": np.asarray(dl.observed, dtype=np.float64),
    }


def cellpop_get_simulated_data(
    handle: str, param_values, data_ix: int, experiment=None
):
    import jax.numpy as jnp

    m = _cellpop(handle)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    t, v = m.simulated_data(vals, data_ix, experiment)
    return {"time": t, "values": v}


def cellpop_get_matched_simulation(
    handle: str, param_values, data_ix: int, experiment=None,
    n_timepoints: int = 500
):
    import jax.numpy as jnp

    m = _cellpop(handle)
    vals = jnp.asarray(np.asarray(param_values, dtype=np.float64))
    t, v = m.matched_simulation(
        vals, data_ix, experiment, n_timepoints=n_timepoints
    )
    return {"time": t, "values": v}
