"""Benchmark: PT-MCMC sampling throughput on the banana workload.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline compares against the measured CPU BCM3 reference throughput if
a measurement file (baseline_cpu.json, produced by tools/measure_baseline.py)
is present; the reference publishes no benchmark numbers (see BASELINE.md).
"""

import json
import os
import sys
import time


def main():
    import jax

    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    ref = "/root/reference/examples/banana"
    varset = VariableSet.from_xml(f"{ref}/prior.xml")
    prior = Prior.from_xml(f"{ref}/prior.xml", varset)
    lik = create_likelihood(f"{ref}/likelihood.xml", varset)

    # banana example configuration (examples/banana/config.txt): 6 chains,
    # GMM proposal, deterministic even/odd swaps, thinning 5
    cfg = PTConfig(
        num_samples=2000,
        use_every_nth=5,
        num_chains=6,
        adapt_proposal_samples=1000,
        adapt_proposal_times=1,
        max_history_size=5000,
        adapt_proposal_max_history_samples=5000,
        swapping_scheme="deterministic_even_odd",
        seed=2024,
    )

    # warmup run to take compilation out of the measurement
    warm = SamplerPT(prior, lik, PTConfig(
        num_samples=20, use_every_nth=5, num_chains=6,
        adapt_proposal_samples=0, adapt_proposal_times=0, seed=1,
    ))
    warm.run()

    s = SamplerPT(prior, lik, cfg)
    t0 = time.time()
    res = s.run()
    elapsed = time.time() - t0
    evals_per_sec = res["evaluations"] / elapsed

    vs = None
    baseline_file = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        ref_v = base.get("banana_evals_per_sec")
        if ref_v:
            vs = evals_per_sec / ref_v

    print(
        json.dumps(
            {
                "metric": "pt_mcmc_likelihood_evals_per_sec_banana",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
