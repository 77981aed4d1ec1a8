"""Backend comparison: the banana posterior via PT, HMC, SMC and VI."""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import (
        HMCConfig,
        PTConfig,
        SamplerHMC,
        SamplerPT,
        SamplerSMC,
        SamplerVI,
        SMCConfig,
        VIConfig,
    )

    d = tempfile.mkdtemp(prefix="backends_")
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

    samplers = {
        "ptmh": SamplerPT(
            prior,
            lik,
            PTConfig(
                num_samples=1500, use_every_nth=2, num_chains=6,
                adapt_proposal_samples=600, adapt_proposal_times=1, seed=1,
            ),
        ),
        "hmc": SamplerHMC(
            prior, lik,
            HMCConfig(num_samples=400, num_warmup=400, num_chains=8, seed=1),
        ),
        "smc": SamplerSMC(
            prior, lik, SMCConfig(num_particles=4096, seed=1)
        ),
        "vi": SamplerVI(
            prior, lik, VIConfig(num_iterations=2000, num_samples=4000, seed=1)
        ),
    }

    for name, s in samplers.items():
        t0 = time.time()
        res = s.run()
        dt = time.time() - t0
        x = res["samples"]
        x = x[x.shape[0] // 2 :, -1, :] if name == "ptmh" else x[:, 0, :]
        line = (
            f"{name:5s} mean=({x[:, 0].mean():+.3f}, {x[:, 1].mean():+.3f}) "
            f"sd=({x[:, 0].std():.3f}, {x[:, 1].std():.3f}) "
            f"wall={dt:.1f}s"
        )
        if "log_marginal_likelihood" in res:
            line += f" logZ={res['log_marginal_likelihood']:.3f}"
        print(line)


if __name__ == "__main__":
    main()
