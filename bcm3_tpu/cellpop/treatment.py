"""Treatment trajectories: time-varying drug inputs to constant species.

TPU-native equivalent of the reference trajectory classes
(reference: src/cellpop/TreatmentTrajectory.cpp,
TreatmentTrajectoryFromData.cpp, TreatmentTrajectoryPulses.cpp). The
reference informs the solver of upcoming discontinuities via callbacks;
here the trajectory is a jnp-traceable function of global time which the
RHS closure evaluates every step — XLA fuses the lookup into the RHS,
and the adaptive step controller resolves the kinks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class TreatmentTrajectoryFromData:
    """Piecewise-linear concentration from data
    (reference: TreatmentTrajectoryFromData.cpp GetConcentration:31-55;
    treatment_time is stored in hours and converted to seconds)."""

    timepoints: np.ndarray  # (T,) seconds
    concentrations: np.ndarray  # (T,)

    @classmethod
    def from_data_file(cls, h5_group, treatment_variable: str):
        times = np.asarray(h5_group["treatment_time"], dtype=np.float64) * 3600.0
        conc = np.asarray(h5_group[treatment_variable], dtype=np.float64)
        if conc.ndim == 2:
            conc = conc[0]
        return cls(timepoints=times, concentrations=conc)

    def concentration(self, cell_time, creation_time):
        t = cell_time + creation_time
        return jnp.interp(
            t,
            jnp.asarray(self.timepoints),
            jnp.asarray(self.concentrations),
        )


@dataclass
class TreatmentTrajectoryPulses:
    """Trapezoidal pulses: 2h ramp up starting 2h after each pulse time,
    8h plateau at 1, 4h ramp down
    (reference: TreatmentTrajectoryPulses.cpp GetConcentration:18-40)."""

    timepoints: np.ndarray  # sorted pulse start times

    @classmethod
    def from_xml(cls, node):
        times = np.sort(
            np.array([float(v) for v in node.get("times").split(",")])
        )
        return cls(timepoints=times)

    def concentration(self, cell_time, creation_time):
        t = cell_time + creation_time
        tp = jnp.asarray(self.timepoints)
        t_in_pulse = t - tp - 2.0  # (P,)
        ramp_up = jnp.clip(t_in_pulse * 0.5, 0.0, 1.0)
        ramp_down = jnp.clip(1.0 - (t_in_pulse - 10.0) * 0.25, 0.0, 1.0)
        val = jnp.where(
            (t_in_pulse > 0.0) & (t_in_pulse < 14.0),
            jnp.minimum(ramp_up, ramp_down),
            0.0,
        )
        return jnp.max(val)


def create_treatment_trajectory(node, h5_group=None):
    """Factory (reference: TreatmentTrajectory.cpp Create: type
    'from_data' | 'pulses')."""
    ttype = node.get("type", "from_data")
    if ttype == "pulses":
        return TreatmentTrajectoryPulses.from_xml(node)
    if ttype == "from_data":
        if h5_group is None:
            raise ValueError("from_data treatment trajectory requires a data file")
        treatment_variable = node.get(
            "treatment_variable", node.get("species_name")
        )
        return TreatmentTrajectoryFromData.from_data_file(
            h5_group, treatment_variable
        )
    raise ValueError(f"Unknown treatment trajectory type '{ttype}'")
