"""Top-level cell-population likelihood: sum over experiments.

TPU-native equivalent of the reference CellPopulationLikelihood
(reference: src/cellpop/CellPopulationLikelihood.cpp:15-95). The
reference clones the whole likelihood per sampling thread because it is
stateful and non-reentrant (CellPopulationLikelihood.h:23); here
``log_prob`` is a pure function of the parameter vector, so it is
reentrant by construction and vmaps over the chain population.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from bcm3_tpu.cellpop.experiment import Experiment
from bcm3_tpu.model.variables import (
    TRANSFORM_LOG,
    TRANSFORM_LOG10,
    TRANSFORM_LOGIT,
    VariableSet,
)


class CellPopulationLikelihood:
    def __init__(
        self,
        experiments: List[Experiment],
        varset: VariableSet,
    ):
        self.experiments = experiments
        self.varset = varset
        self._transforms = np.asarray(varset.transforms)

    @classmethod
    def from_xml_node(
        cls,
        root: ET.Element,
        varset: VariableSet,
        base_dir: str = ".",
        non_sampled_names=None,
    ) -> "CellPopulationLikelihood":
        experiments = [
            Experiment(node, varset, base_dir, non_sampled_names)
            for node in root.findall("experiment")
        ]
        if not experiments:
            raise ValueError("cell_population likelihood requires experiments")
        return cls(experiments, varset)

    def _transform(self, values):
        t = jnp.asarray(self._transforms)
        x = values
        x = jnp.where(t == TRANSFORM_LOG, jnp.exp(values), x)
        x = jnp.where(t == TRANSFORM_LOG10, jnp.power(10.0, values), x)
        x = jnp.where(t == TRANSFORM_LOGIT, 1.0 / (1.0 + jnp.exp(-values)), x)
        return x

    def log_prob(self, values):
        tv = self._transform(values)
        logp = jnp.zeros((), dtype=values.dtype)
        for exp in self.experiments:
            logp = logp + exp.log_prob(tv)
        return jnp.where(jnp.isnan(logp), -jnp.inf, logp)

    # Two-phase evaluation for runtimes without in-graph host callbacks
    # (tunneled axon PJRT): the device computes everything up to the
    # Hungarian cost matrices, the host solves the matchings with the
    # native LAP solver. Semantically identical to log_prob.

    def log_prob_parts(self, values):
        """Jittable device half; see Experiment.log_prob_parts."""
        tv = self._transform(values)
        parts = []
        for exp in self.experiments:
            parts.append(exp.log_prob_parts(tv))
        return tuple(parts)

    def finish_log_prob_host(self, parts) -> float:
        total = 0.0
        for exp, (partial, ok, costs) in zip(self.experiments, parts):
            total += exp.finish_log_prob_host(partial, ok, costs)
        return total

    def log_prob_batch_hostmatch(self, values_batch) -> np.ndarray:
        """Batched two-phase evaluation: one jitted vmapped device
        program for the simulations + cost matrices, then the native
        LAP solver per batch row on the host. BCM3_MATCH_THREADS>1 runs
        rows in a thread pool (the C LAP call releases the GIL) — an
        opt-in for models with LARGE per-row matchings; at bench-scale
        matrices (16x128) the Python row bookkeeping dominates and the
        pool measurably hurts (1131 serial vs 1048 threaded evals/s,
        v5e 2026-08-21), so serial is the default."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        import jax

        if not hasattr(self, "_parts_fn"):
            self._parts_fn = jax.jit(jax.vmap(self.log_prob_parts))
        out = self._parts_fn(jnp.asarray(values_batch))
        host = jax.tree_util.tree_map(np.asarray, out)
        B = np.asarray(values_batch).shape[0]

        def row(b):
            return jax.tree_util.tree_map(lambda a: a[b], host)

        workers = min(int(os.environ.get("BCM3_MATCH_THREADS", "1")),
                      max(B, 1))
        if workers > 1 and B > 1:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                vals = list(
                    ex.map(lambda b: self.finish_log_prob_host(row(b)),
                           range(B))
                )
            return np.asarray(vals)
        return np.asarray(
            [self.finish_log_prob_host(row(b)) for b in range(B)]
        )

    def get_experiment(self, name: Optional[str] = None) -> Experiment:
        """Experiment by name (reference:
        CellPopulationLikelihood::GetExperiment); None -> first."""
        if name is None or name == "":
            return self.experiments[0]
        for exp in self.experiments:
            if exp.name == name:
                return exp
        raise KeyError(f"No experiment named '{name}'")

    # Posterior-predictive accessors on UNTRANSFORMED parameter values —
    # the Python side of the cellpop R bridge
    # (reference: src/bcmrbridge/interface_cellpop.cpp:45-418).

    def simulated_trajectories(self, values, experiment=None, **kw):
        return self.get_experiment(experiment).simulated_trajectories(
            self._transform(values), **kw
        )

    def simulated_data(self, values, data_ix: int, experiment=None):
        return self.get_experiment(experiment).simulated_data(
            self._transform(values), data_ix
        )

    def matched_simulation(self, values, data_ix: int, experiment=None, **kw):
        return self.get_experiment(experiment).matched_simulation(
            self._transform(values), data_ix, **kw
        )

    def close(self):
        for exp in self.experiments:
            exp.close()


def create_cellpop_likelihood(varset: VariableSet, attrs):
    """Factory entry (reference: LikelihoodFactory.cpp 'cell_population')."""
    root = attrs.get("_xml_root")
    if root is None:
        raise ValueError("cell_population likelihood requires an XML definition")
    xml_path = attrs.get("_xml_path")
    base_dir = os.path.dirname(xml_path) if xml_path else "."
    return CellPopulationLikelihood.from_xml_node(root, varset, base_dir)
