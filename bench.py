"""Benchmark: PT-MCMC likelihood-evaluation throughput on the PopPK workload.

The headline metric from BASELINE.json: log-prob evals/sec on the PopPK
population-pharmacokinetics ODE likelihood (the reference's primary
workload, LikelihoodPopPKTrajectory). One evaluation = simulating the full
patient population's dosing-event compartment trajectories and scoring all
observations; the sampler batches one evaluation per chain per PT step.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline compares against measured CPU BCM3 throughput if a measurement
file (baseline_cpu.json, from tools/measure_baseline.py) is present; the
reference publishes no benchmark numbers (see BASELINE.md).
"""

import json
import os
import sys
import tempfile
import time

NUM_PATIENTS = 16
NUM_TIMEPOINTS = 24
NUM_CHAINS = 8
# independent PT replicas batched on device — the TPU-native throughput
# lever. 8192 replicas x 8 chains = 65536 concurrent chains saturates a
# single v5e chip without exhausting HBM (32768 replicas OOMs).
NUM_ENSEMBLES = int(os.environ.get("BENCH_ENSEMBLES", "8192"))


def build_sampler(num_samples, adapt_times, seed):
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.likelihoods.poppk_synth import (
        synthesize_trial,
        write_poppk_likelihood_xml,
        write_poppk_prior_xml,
    )
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    d = tempfile.mkdtemp(prefix="bcm3_bench_")
    trial, truth = synthesize_trial(
        num_patients=NUM_PATIENTS, num_timepoints=NUM_TIMEPOINTS, seed=42
    )
    pkdata = os.path.join(d, "pkdata.nc")
    trial.save(pkdata, "TRIAL1", "lapatinib")
    prior_xml = os.path.join(d, "prior.xml")
    lik_xml = os.path.join(d, "likelihood.xml")
    write_poppk_prior_xml(prior_xml, NUM_PATIENTS, "one")
    write_poppk_likelihood_xml(lik_xml, pkdata, "TRIAL1", "lapatinib", "one")

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)
    cfg = PTConfig(
        num_samples=num_samples,
        use_every_nth=2,
        num_chains=NUM_CHAINS,
        num_ensembles=NUM_ENSEMBLES,
        adapt_proposal_samples=num_samples // 2 if adapt_times else 0,
        adapt_proposal_times=adapt_times,
        max_history_size=2000,
        swapping_scheme="deterministic_even_odd",
        seed=seed,
    )
    return SamplerPT(prior, lik, cfg)


def main():
    # one sampler instance: the first run() compiles the sampling segment,
    # the second reuses the cached executable and measures steady-state
    # throughput (first compile on a tunneled TPU dominates otherwise)
    s = build_sampler(100, 0, 2024)
    s.run()  # compile + warm caches

    t0 = time.time()
    res = s.run()
    elapsed = time.time() - t0
    evals_per_sec = res["evaluations"] / elapsed

    vs = None
    baseline_file = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        ref_v = base.get("poppk_evals_per_sec")
        if ref_v:
            vs = evals_per_sec / ref_v

    print(
        json.dumps(
            {
                "metric": "poppk_pt_mcmc_llh_evals_per_sec",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
