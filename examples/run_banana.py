"""Banana-ridge demo: PT sampling with GMM proposal adaptation.

Generates the prior/likelihood XML, runs the PT sampler, and compares the
posterior moments against 2-D quadrature.
"""

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

    d = tempfile.mkdtemp(prefix="banana_")
    prior_xml = os.path.join(d, "prior.xml")
    lik_xml = os.path.join(d, "likelihood.xml")
    with open(prior_xml, "w") as f:
        f.write(
            "<prior>\n"
            '  <variable name="x1" distribution="uniform" lower="-5" upper="5"/>\n'
            '  <variable name="x2" distribution="uniform" lower="-5" upper="15"/>\n'
            "</prior>\n"
        )
    with open(lik_xml, "w") as f:
        f.write('<bcm_likelihood type="banana" sd1="2" sd2="1"/>\n')

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)
    cfg = PTConfig(
        num_samples=2000,
        use_every_nth=3,
        num_chains=6,
        adapt_proposal_samples=800,
        adapt_proposal_times=2,
        seed=1,
    )
    res = SamplerPT(prior, lik, cfg).run()
    x = res["samples"][1000:, -1, :]

    # quadrature ground truth
    g1 = np.linspace(-5, 5, 1200)
    g2 = np.linspace(-5, 15, 2400)
    X1, X2 = np.meshgrid(g1, g2, indexing="ij")
    logp = -0.5 * (X1 / 2.0) ** 2 - 0.5 * (X2 - (4 * X1 + (1 - X1) ** 2)) ** 2
    p = np.exp(logp - logp.max())
    p /= p.sum()
    m_exact = np.array([(p * X1).sum(), (p * X2).sum()])

    print(f"posterior mean (sampled):    {x.mean(axis=0)}")
    print(f"posterior mean (quadrature): {m_exact}")
    print(f"evals/sec: {res['evals_per_second']:.0f}")


if __name__ == "__main__":
    main()
