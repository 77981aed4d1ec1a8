"""Population-PK demo: synthetic trial generation + parameter recovery."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.likelihoods.poppk_synth import (
        synthesize_trial,
        write_poppk_likelihood_xml,
        write_poppk_prior_xml,
    )
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    d = tempfile.mkdtemp(prefix="poppk_")
    trial, truth = synthesize_trial(num_patients=16, num_timepoints=24, seed=0)
    pkdata = os.path.join(d, "pkdata.nc")
    trial.save(pkdata, "TRIAL1", "lapatinib")
    prior_xml = os.path.join(d, "prior.xml")
    lik_xml = os.path.join(d, "likelihood.xml")
    write_poppk_prior_xml(prior_xml, 16, "one")
    write_poppk_likelihood_xml(lik_xml, pkdata, "TRIAL1", "lapatinib", "one")

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)
    cfg = PTConfig(
        num_samples=1500,
        use_every_nth=2,
        num_chains=6,
        adapt_proposal_samples=600,
        adapt_proposal_times=1,
        seed=5,
    )
    res = SamplerPT(prior, lik, cfg).run()
    x = res["samples"][750:, -1, :]
    names = varset.names
    for pname, tname in [
        ("absorption", "mu_abs"),
        ("elimination", "mu_elim"),
    ]:
        ix = names.index(pname)
        print(
            f"{pname}: posterior {x[:, ix].mean():+.3f} "
            f"± {x[:, ix].std():.3f}, truth {truth[tname]:+.3f}"
        )
    print(f"evals/sec: {res['evals_per_second']:.0f}")


if __name__ == "__main__":
    main()
