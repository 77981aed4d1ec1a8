"""Contract tests for the R-bridge backend (bcm3_tpu/rbridge.py).

The reference's R users call `.C()` accessors from bcmrbridge
(reference: src/bcmrbridge/interface.cpp, interface_popPK.cpp:41-120);
here the same contract is a Python module that R/bcm3tpu.r wraps 1:1
with reticulate. These tests pin the Python side of that contract —
array orientation (timepoints x patients, matching the reference's
R-side array(c(nt, np))), likelihood equality with the in-framework
evaluation, and handle lifecycle.
"""

import os
import tempfile

import numpy as np
import pytest

from bcm3_tpu import rbridge
from bcm3_tpu.likelihoods.poppk_synth import (
    synthesize_trial,
    truth_to_values,
    write_poppk_likelihood_xml,
    write_poppk_prior_xml,
)


@pytest.fixture(scope="module")
def poppk_folder():
    d = tempfile.mkdtemp(prefix="rbridge_")
    trial, truth = synthesize_trial(num_patients=4, num_timepoints=12, seed=3)
    trial.save(os.path.join(d, "pkdata.nc"), "TRIAL1", "lapatinib")
    write_poppk_prior_xml(os.path.join(d, "prior.xml"), 4, "one")
    write_poppk_likelihood_xml(
        os.path.join(d, "likelihood.xml"),
        os.path.join(d, "pkdata.nc"),
        "TRIAL1",
        "lapatinib",
        "one",
    )
    return d, trial, truth


def test_init_and_cleanup(poppk_folder):
    d, trial, truth = poppk_folder
    h = rbridge.init(d)
    assert rbridge.get_variable_names(h)
    rbridge.cleanup(h)
    with pytest.raises(KeyError):
        rbridge.get_log_likelihood(h, np.zeros(3))


def test_poppk_accessors_match_model(poppk_folder):
    d, trial, truth = poppk_folder
    h = rbridge.init(d)
    try:
        from bcm3_tpu.likelihoods import create_likelihood
        from bcm3_tpu.model.variables import VariableSet

        varset = VariableSet.from_xml(os.path.join(d, "prior.xml"))
        lik = create_likelihood(os.path.join(d, "likelihood.xml"), varset)
        vals = truth_to_values(truth, varset, "one")

        ll_bridge = rbridge.get_log_likelihood(h, vals)
        ll_direct = float(lik.log_prob(np.asarray(vals)))
        assert np.isfinite(ll_bridge)
        np.testing.assert_allclose(ll_bridge, ll_direct, rtol=1e-12)

        obs = rbridge.popPK_get_observed_data(h)
        T, P = len(trial.time), trial.num_patients
        assert obs["time"].shape == (T,)
        assert obs["data"].shape == (T, P)  # reference R layout (nt, np)
        np.testing.assert_allclose(
            obs["data"], np.asarray(trial.observed).T
        )

        sim = rbridge.popPK_get_simulated_data(h, vals)
        assert sim["data"].shape == (T, P)
        assert np.isfinite(sim["data"]).all()
        # the simulation should track the (noisy) observations
        mask = np.isfinite(obs["data"])
        resid = np.abs(sim["data"][mask] - obs["data"][mask])
        assert np.median(resid) < np.median(np.abs(obs["data"][mask])) * 0.5
    finally:
        rbridge.cleanup(h)


def test_prior_accessor(poppk_folder):
    d, trial, truth = poppk_folder
    h = rbridge.init(d)
    try:
        from bcm3_tpu.model.prior import Prior
        from bcm3_tpu.model.variables import VariableSet

        varset = VariableSet.from_xml(os.path.join(d, "prior.xml"))
        prior = Prior.from_xml(os.path.join(d, "prior.xml"), varset)
        vals = truth_to_values(truth, varset, "one")
        lp = rbridge.get_log_prior(h, vals)
        np.testing.assert_allclose(
            lp, float(prior.log_pdf(np.asarray(vals))), rtol=1e-12
        )
    finally:
        rbridge.cleanup(h)


# ---------------------------------------------------------------------------
# Full-trajectory popPK accessor (reference: interface_popPK.cpp:79-120)


def test_poppk_simulated_trajectories(poppk_folder):
    d, trial, truth = poppk_folder
    h = rbridge.init(d)
    try:
        from bcm3_tpu.model.variables import VariableSet

        varset = VariableSet.from_xml(os.path.join(d, "prior.xml"))
        vals = truth_to_values(truth, varset, "one")
        res = rbridge.popPK_get_simulated_trajectories(h, vals)
        T, P = len(trial.time), trial.num_patients
        assert res["concentrations"].shape == (T, P)
        # one-compartment model: 2 compartments [gut, central]
        assert res["trajectories"].shape == (2, T, P)
        # the central-compartment concentration is what get_simulated_data
        # returns
        sim = rbridge.popPK_get_simulated_data(h, vals)
        np.testing.assert_allclose(res["concentrations"], sim["data"], rtol=1e-10)
        assert np.isfinite(res["trajectories"]).all()
    finally:
        rbridge.cleanup(h)


# ---------------------------------------------------------------------------
# Cellpop accessors (reference: interface_cellpop.cpp:45-418)

SBML_NS = "http://www.sbml.org/sbml/level2/version4"
MATHML = "http://www.w3.org/1998/Math/MathML"

CELL_MODEL = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4">
<model id="cell">
<listOfSpecies>
  <species id="mass" name="mass" initialAmount="1.0"/>
  <species id="cytokinesis" name="cytokinesis" initialAmount="0.0"/>
</listOfSpecies>
<listOfReactions>
  <reaction id="growth">
    <listOfProducts><speciesReference species="mass"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}">
      <apply><times/><ci>k_growth</ci><ci>mass</ci></apply>
    </math></kineticLaw>
  </reaction>
  <reaction id="division_clock">
    <listOfProducts><speciesReference species="cytokinesis"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}"><ci>k_div</ci></math></kineticLaw>
  </reaction>
</listOfReactions>
</model>
</sbml>
"""


@pytest.fixture(scope="module")
def cellpop_folder():
    import h5py

    d = tempfile.mkdtemp(prefix="rbridge_cellpop_")
    with open(os.path.join(d, "cell.xml"), "w") as f:
        f.write(CELL_MODEL)
    times = np.array([0.5, 2.0, 4.5, 6.0, 7.5])
    k_growth = 0.1
    avg = np.exp(k_growth * times)[None, :]
    # two observed single-cell mass traces for the time_course matching
    tc = np.stack([np.exp(k_growth * times), 0.5 * np.exp(k_growth * times)])
    with h5py.File(os.path.join(d, "data.nc"), "w") as f:
        g = f.create_group("exp1")
        g.create_dataset("time", data=times)
        g.create_dataset("avg_mass", data=avg)
        g.create_dataset("cell_mass", data=tc)
    with open(os.path.join(d, "likelihood.xml"), "w") as f:
        f.write(
            '<bcm_likelihood type="cell_population">\n'
            '<experiment name="exp1" model_file="cell.xml" data_file="data.nc"\n'
            '  num_cells="1" max_cells="7" divide_cells="true" entry_time="0"\n'
            '  solver_type="DP5" solver_relative_tolerance="1e-8"\n'
            '  solver_absolute_tolerance="1e-10" trailing_simulation_time="0.5">\n'
            '  <data type="time_course_population_average" data_name="avg_mass"\n'
            '    species_name="mass" error_model="normal" stdev="sd"/>\n'
            '  <data type="time_course" data_name="cell_mass"\n'
            '    species_name="mass" error_model="normal" stdev="sd"/>\n'
            "</experiment>\n"
            "</bcm_likelihood>\n"
        )
    with open(os.path.join(d, "prior.xml"), "w") as f:
        f.write(
            '<?xml version="1.0"?>\n<prior>\n'
            '  <variable name="k_growth" distribution="uniform" lower="0.01" upper="1"/>\n'
            '  <variable name="k_div" distribution="uniform" lower="0.01" upper="1"/>\n'
            '  <variable name="sd" distribution="uniform" lower="0.001" upper="1"/>\n'
            "</prior>\n"
        )
    return d, times


def test_cellpop_accessors(cellpop_folder):
    d, times = cellpop_folder
    h = rbridge.init(d)
    vals = np.array([0.1, 0.25, 0.05])
    try:
        assert rbridge.cellpop_get_num_species(h) == 2
        assert rbridge.cellpop_get_species_names(h) == ["mass", "cytokinesis"]
        assert rbridge.cellpop_get_num_data(h) == 2
        assert np.isfinite(rbridge.get_log_likelihood(h, vals))

        traj = rbridge.cellpop_get_simulated_trajectories(h, vals, n_timepoints=60)
        # k_div=0.25 -> one division inside the horizon -> 3 cells
        assert traj["values"].shape == (3, 60, 2)
        assert traj["time"].shape == (60,)
        # initial cell has parent -1; both daughters point at it
        assert traj["parents"][0] == -1
        assert (traj["parents"][1:] == 0).all()
        # mass trajectory of the initial cell grows and is finite pre-division
        m0 = traj["values"][0, :, 0]
        valid = ~np.isnan(m0)
        assert valid.sum() > 10
        assert np.nanmax(m0) > 1.0

        obs = rbridge.cellpop_get_observed_data(h, 0)
        np.testing.assert_allclose(obs["time"], times)

        sim = rbridge.cellpop_get_simulated_data(h, vals, 0)
        # population average: (T,) finite
        assert sim["values"].shape == times.shape
        assert np.isfinite(sim["values"]).all()
        np.testing.assert_allclose(
            sim["values"], np.exp(0.1 * times), rtol=0.05
        )

        sim_tc = rbridge.cellpop_get_simulated_data(h, vals, 1)
        assert sim_tc["values"].shape == (7, len(times), 1)  # (slots, T, S)

        matched = rbridge.cellpop_get_matched_simulation(
            h, vals, 1, n_timepoints=60
        )
        # 2 observed cells, each matched to a simulated cell's trajectory
        assert matched["values"].shape == (2, 60, 2)
        assert np.isfinite(matched["values"]).any(axis=(1, 2)).all()
    finally:
        rbridge.cleanup(h)


# ---------------------------------------------------------------------------
# Hand-registered handles for model-level accessor families (the XML init
# path is covered above; these pin the accessor contracts)


def _register(model):
    handle = f"test_{id(model)}"
    rbridge._handles[handle] = {"likelihood": model, "varset": None,
                                "prior": None, "base_folder": ""}
    return handle


def test_incucyte_accessors():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_cellmisc import _incucyte_setup

    m, values = _incucyte_setup()
    h = _register(m)
    try:
        res = rbridge.incucyte_get_simulated_trajectories(h, values, 0)
        T = len(m.experiments[0].timepoints)
        C = len(m.experiments[0].concentrations)
        for k in ("cell_count", "apoptotic_cell_count", "debris",
                  "confluence", "apoptosis_marker"):
            assert res[k].shape == (2 + C, T)
            assert np.isfinite(res[k]).all()
        # cell counts grow in the negative control
        assert res["cell_count"][0, -1] > res["cell_count"][0, 0]
        ctb = rbridge.incucyte_get_simulated_ctb(h, values, 0)
        assert ctb.shape == (C,)
        # the sequential-subtraction parametrization accumulates the
        # proliferation deltas toward concentration index 0 (reference:
        # LikelihoodIncucytePopulation.cpp:208-223 iterates ci high->low,
        # subtracting before simulating), so index 0 is most suppressed
        assert ctb[0] <= ctb[-1]
        assert (ctb > 0).all() and (ctb <= 1.5).all()
    finally:
        rbridge.cleanup(h)


def test_pharmaco_accessors():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax.numpy as jnp
    from test_pharmaco import _single_varset

    from bcm3_tpu.likelihoods.pharmaco import (
        PharmacoLikelihoodSingle,
        PharmacoModelConfig,
    )
    from bcm3_tpu.likelihoods.poppk_synth import synthesize_trial

    trial, _ = synthesize_trial(num_patients=1, num_timepoints=10, seed=7)
    cfg = PharmacoModelConfig()
    m = PharmacoLikelihoodSingle(_single_varset(), trial, "lapatinib", cfg)

    class Wrapper:
        model = m
        log_prob = staticmethod(m.log_prob)

    h = _register(Wrapper())
    vals = np.array([-0.3, 1.25, 2.08, 20.0, 0.08])
    try:
        obs = rbridge.pharmacosingle_get_observed_data(h)
        assert obs["time"].shape == obs["data"].shape

        sim = rbridge.pharmacosingle_get_simulated_data(h, vals)
        assert sim["data"].shape == obs["data"].shape
        assert np.isfinite(sim["data"]).all()

        tps = np.linspace(1.0, 100.0, 25)
        res = rbridge.pharmacosingle_get_simulated_trajectory(h, vals, tps)
        assert res["concentrations"].shape == (25,)
        n_comp = res["trajectories"].shape[0]
        assert res["trajectories"].shape == (n_comp, 25)
        assert res["ok"]
        # concentrations at observed times agree between the two accessors
        res_at_obs = rbridge.pharmacosingle_get_simulated_trajectory(
            h, vals, obs["time"]
        )
        np.testing.assert_allclose(
            res_at_obs["concentrations"], sim["data"], rtol=1e-8
        )
    finally:
        rbridge.cleanup(h)


def test_ode_template_accessor():
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.variables import VariableSet

    vs = VariableSet()
    for i in range(13):
        vs.add_variable(f"p{i}")
    lik = create_likelihood("ODE", vs)
    h = _register(lik)
    try:
        vals = np.concatenate([np.full(9, 0.1), [300.0, 10.0, 10.0, 10.0]])
        traj = rbridge.ODE_get_simulated_trajectories(h, vals)
        assert traj.shape == (4, 100)
        assert np.isfinite(traj).all()
    finally:
        rbridge.cleanup(h)


def test_pharmacopop_accessors():
    import jax.numpy as jnp

    from bcm3_tpu.likelihoods.pharmaco import (
        PharmacoLikelihoodPopulation,
        PharmacoModelConfig,
    )
    from bcm3_tpu.likelihoods.poppk_synth import synthesize_trial
    from bcm3_tpu.model.variables import VariableSet

    P = 3
    trial, _ = synthesize_trial(num_patients=P, num_timepoints=10, seed=11)
    vs = VariableSet()
    vs.add_variable("mean_absorption")
    vs.add_variable("sigma_absorption")
    vs.add_variable("mean_clearance")
    vs.add_variable("mean_volume_of_distribution")
    for j in range(P):
        vs.add_variable(f"p{j+1}_absorption")
    vs.add_variable("additive_error_standard_deviation")
    m = PharmacoLikelihoodPopulation(vs, trial, "lapatinib", PharmacoModelConfig())

    class Wrapper:
        model = m
        log_prob = staticmethod(m.log_prob)

    h = _register(Wrapper())
    vals = np.zeros(vs.num_variables)
    vals[vs.index_of("mean_absorption")] = -0.3
    vals[vs.index_of("sigma_absorption")] = 0.2
    vals[vs.index_of("mean_clearance")] = np.log10(18.0)
    vals[vs.index_of("mean_volume_of_distribution")] = np.log10(120.0)
    for j in range(P):
        vals[vs.index_of(f"p{j+1}_absorption")] = 0.3 + 0.1 * j
    vals[vs.index_of("additive_error_standard_deviation")] = 25.0
    try:
        assert rbridge.pharmacopop_get_num_patients(h) == P
        obs = rbridge.pharmacopop_get_observed_data(h, 1)
        assert obs["time"].shape == obs["data"].shape

        sim = rbridge.pharmacopop_get_simulated_data(h, vals, 1)
        assert np.isfinite(sim["data"]).all()
        # accessor must agree with the likelihood's own batched simulation
        x, ok = m.simulate_trajectories(jnp.asarray(vals))
        np.testing.assert_allclose(sim["data"], np.asarray(x)[1], rtol=1e-8)

        tps = np.linspace(1.0, 80.0, 15)
        res = rbridge.pharmacopop_get_simulated_trajectory(h, vals, 1, tps)
        assert res["concentrations"].shape == (15,)
        assert res["trajectories"].shape[1] == 15
        assert res["ok"]
    finally:
        rbridge.cleanup(h)


def test_fisa_accessors(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_fisa import _varset, _write_model

    import h5py

    from bcm3_tpu.likelihoods import create_likelihood

    model_path = _write_model(tmp_path)
    cell_lines = ["c1", "c2", "c3"]
    base_egfr = np.array([0.5, 0.7, 0.9])
    obs = 0.8 * 0.9 * base_egfr
    with h5py.File(tmp_path / "data.nc", "w") as f:
        g = f.create_group("exp1")
        g.create_dataset("cell_lines", data=np.array(cell_lines, dtype="S8"))
        g.create_dataset("egfr_levels", data=base_egfr)
        g.create_dataset("prolif_data", data=obs[None, :])
    lik_xml = tmp_path / "likelihood.xml"
    lik_xml.write_text(
        '<bcm_likelihood type="fISA">\n'
        '<experiment name="exp1" model_file="net.xml" data_file="data.nc">\n'
        '  <condition species_name="EGFR" data_name="egfr_levels"/>\n'
        '  <data species_name="proliferation" data_name="prolif_data"\n'
        '    likelihood_function="normal" use_base="false" use_scale="false"\n'
        '    scale_var_with_mean="false" sd="0.05"/>\n'
        "</experiment>\n"
        "</bcm_likelihood>\n"
    )
    lik = create_likelihood(str(lik_xml), _varset())
    h = _register(lik)
    vals = np.array([0.7, 0.9, 0.8, 0.0])
    try:
        assert rbridge.fISA_get_num_experiments(h) == 1
        assert rbridge.fISA_get_num_data(h, 0) == 1
        assert rbridge.fISA_get_num_cell_lines(h, 0) == 3
        assert rbridge.fISA_get_cell_line_names(h, 0) == cell_lines

        od = rbridge.fISA_get_observed_data(h, 0, 0)
        np.testing.assert_allclose(od, obs[None, :])

        acts = rbridge.fISA_get_modeled_activities(h, 0, vals)
        assert acts.shape[0] == 3  # per cell line
        assert np.isfinite(acts).all()

        md = rbridge.fISA_get_modeled_data(h, 0, 0, vals)
        assert md.shape == (3,)
        # at the truth the modeled data reproduces the observations
        np.testing.assert_allclose(md, obs, atol=0.05)
    finally:
        rbridge.cleanup(h)
