"""Bimodal-Gaussian demo: clustered-covariance proposal with spectral
sample-history clustering."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    d = tempfile.mkdtemp(prefix="mm_")
    prior_xml = os.path.join(d, "prior.xml")
    lik_xml = os.path.join(d, "likelihood.xml")
    with open(prior_xml, "w") as f:
        f.write(
            "<prior>\n"
            '  <variable name="x1" distribution="uniform" lower="-10" upper="10"/>\n'
            '  <variable name="x2" distribution="uniform" lower="-10" upper="10"/>\n'
            "</prior>\n"
        )
    with open(lik_xml, "w") as f:
        f.write('<bcm_likelihood type="multimodal_gaussians"/>\n')

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)
    cfg = PTConfig(
        num_samples=3000,
        use_every_nth=2,
        num_chains=4,
        proposal_type="clustered_covariance",
        blocking_strategy="clustered_autoblock",
        sample_clustering_num_clusters=2,
        adapt_proposal_samples=1000,
        adapt_proposal_times=2,
        seed=7,
    )
    res = SamplerPT(prior, lik, cfg).run()
    x = res["samples"][1500:, -1, :]
    in_mode1 = x[:, 0] < 0
    print(f"mode balance: {in_mode1.mean():.3f} (expected ~0.5)")
    print(f"mode 1 mean: {x[in_mode1].mean(axis=0)} (expected [-5, -5])")
    print(f"mode 2 mean: {x[~in_mode1].mean(axis=0)} (expected [5, 5])")
    print(f"evals/sec: {res['evals_per_second']:.0f}")


if __name__ == "__main__":
    main()
