"""Single-patient PK likelihood tests
(reference: src/likelihoods/LikelihoodPharmacokineticTrajectory.cpp)."""

import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.likelihoods.pk_single import (
    SinglePatientPKLikelihood,
    select_patient,
)
from bcm3_tpu.likelihoods.poppk_synth import _propagate_np, synthesize_trial
from bcm3_tpu.model.variables import VariableSet


def _varset_one():
    vs = VariableSet()
    vs.add_variable("absorption", logspace=True)
    vs.add_variable("excretion", logspace=True)
    vs.add_variable("elimination", logspace=True)
    vs.add_variable("volume_of_distribution", logspace=True)
    vs.add_variable("standard_deviation")
    vs.add_variable("proportional_standard_deviation")
    return vs


def test_single_patient_matches_oracle():
    trial, truth = synthesize_trial(num_patients=4, num_timepoints=16, seed=7)
    pid = trial.patient_ids[2]
    pid_str = pid.decode() if isinstance(pid, bytes) else str(pid)
    single = select_patient(trial, pid_str)
    assert single.num_patients == 1

    vs = _varset_one()
    lik = SinglePatientPKLikelihood(vs, single, "one", "lapatinib")
    ka, kel_v = truth["ka"][2], truth["kel"][2] * truth["vod"]
    values = jnp.asarray(
        [
            np.log10(ka),
            np.log10(truth["ke"]),
            np.log10(kel_v),
            np.log10(truth["vod"]),
            truth["sd"],
            truth["sd2"],
        ]
    )
    got = float(lik.log_prob(values))

    conversion = (1e6 / 581.06) / truth["vod"]
    expected = 0.0
    K = int(np.ceil(single.time.max() / single.dosing_interval[0]))
    y = np.zeros(3)
    y[0] = single.dose[0]
    states = [y.copy()]
    kel = truth["kel"][2]
    for k in range(1, K + 1):
        y = _propagate_np(
            y, single.dosing_interval[0], ka, truth["ke"], kel, 0, 0, "one"
        )
        day = int((k * single.dosing_interval[0]) // 24)
        if not (day < 29 and single.interruptions[0, day]):
            y[0] += single.dose[0]
        states.append(y.copy())
    for i, t in enumerate(single.time):
        obs = single.observed[0, i]
        if np.isnan(obs):
            continue
        k = max(0, int(np.floor((t - 1e-9) / single.dosing_interval[0])))
        dt = t - k * single.dosing_interval[0]
        yy = _propagate_np(states[k], dt, ka, truth["ke"], kel, 0, 0, "one")
        x = yy[1] * conversion
        sd = truth["sd"] + truth["sd2"] * max(x, 0.0)
        expected += st.t.logpdf(x, 4, loc=obs, scale=sd)
    np.testing.assert_allclose(got, expected, rtol=1e-7)


def test_single_patient_from_xml(tmp_path):
    trial, truth = synthesize_trial(num_patients=3, num_timepoints=12, seed=9)
    pkfile = tmp_path / "pkdata.nc"
    trial.save(str(pkfile), "trial1", "lapatinib")
    pid = trial.patient_ids[0]
    pid_str = pid.decode() if isinstance(pid, bytes) else str(pid)
    xml = tmp_path / "likelihood.xml"
    xml.write_text(
        '<bcm_likelihood type="pharmacokinetic_trajectory">\n'
        f'  <pk_model drug="lapatinib" type="one" trial="trial1" '
        f'patient="{pid_str}" pkdata_file="{pkfile}"/>\n'
        "</bcm_likelihood>\n"
    )
    vs = _varset_one()
    lik = create_likelihood(str(xml), vs)
    values = jnp.asarray([-0.3, -1.5, 0.3, 2.08, 20.0, 0.08])
    lp = float(lik.log_prob(values))
    assert np.isfinite(lp)
    # simulated trajectories exposed for the R-bridge equivalent
    traj = lik.model.simulate_trajectories(values)
    assert traj.shape == (1, 12)


def test_single_patient_fixed_vod():
    trial, truth = synthesize_trial(num_patients=2, num_timepoints=10, seed=11)
    pid = trial.patient_ids[0]
    pid_str = pid.decode() if isinstance(pid, bytes) else str(pid)
    single = select_patient(trial, pid_str)
    vs = VariableSet()
    vs.add_variable("absorption", logspace=True)
    vs.add_variable("excretion", logspace=True)
    vs.add_variable("elimination", logspace=True)
    vs.add_variable("volume_of_distribution", logspace=True)  # unused slot
    vs.add_variable("standard_deviation")
    vs.add_variable("proportional_standard_deviation")
    lik_free = SinglePatientPKLikelihood(vs, single, "one", "lapatinib")
    lik_fixed = SinglePatientPKLikelihood(
        vs, single, "one", "lapatinib", fixed_vod=120.0
    )
    v = np.asarray([-0.3, -1.5, 0.3, np.log10(120.0), 20.0, 0.08])
    a = float(lik_free.log_prob(jnp.asarray(v)))
    b = float(lik_fixed.log_prob(jnp.asarray(v)))
    np.testing.assert_allclose(a, b, rtol=1e-12)
