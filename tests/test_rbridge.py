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
