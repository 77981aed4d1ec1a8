"""Spectral clustering + clustered-covariance proposal tests
(reference: src/sampler/SampleHistoryClustering.cpp,
ProposalClusteredCovariance.cpp)."""

import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import PTConfig, SamplerPT
from bcm3_tpu.sampler import spectral

REF = "/root/reference/examples"


def _two_blobs(n_per=60, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n_per, 2)) * 0.5 + np.array([-sep / 2, 0.0])
    b = rng.normal(size=(n_per, 2)) * 0.5 + np.array([sep / 2, 0.0])
    return np.concatenate([a, b]), np.r_[np.zeros(n_per), np.ones(n_per)]


def test_fit_separates_blobs():
    x, true_labels = _two_blobs()
    rng = np.random.default_rng(1)
    asg = spectral.fit_spectral_clustering(
        x, nn=3, nn2=7, num_clusters=2, max_samples=1000, rng=rng
    )
    assert asg is not None
    labels = spectral.assign_host(asg, x)
    # labels must be a (possibly permuted) match of the true split
    same = labels == labels[0]
    acc = max(
        (same == (true_labels == true_labels[0])).mean(),
        (same != (true_labels == true_labels[0])).mean(),
    )
    assert acc > 0.95, acc


def test_device_assign_matches_host():
    import jax

    x, _ = _two_blobs(seed=3)
    rng = np.random.default_rng(2)
    asg = spectral.fit_spectral_clustering(
        x, nn=3, nn2=7, num_clusters=2, max_samples=80, rng=rng
    )
    assert asg is not None
    queries = np.array([[-4.0, 0.3], [4.0, -0.2], [-3.5, 1.0], [3.8, 0.5]])
    host = spectral.assign_host(asg, queries)
    dev = np.asarray(spectral.assign_batch(asg, jax.numpy.asarray(queries)))
    np.testing.assert_array_equal(host, dev)


def test_fit_degenerate_history_returns_none():
    rng = np.random.default_rng(0)
    x = np.ones((50, 3))  # zero variance
    assert (
        spectral.fit_spectral_clustering(x, 3, 7, 2, 100, rng) is None
    )
    x2 = np.zeros((4, 2))  # too few unique samples
    assert spectral.fit_spectral_clustering(x2, 3, 7, 2, 100, rng) is None


def _setup(example):
    varset = VariableSet.from_xml(f"{REF}/{example}/prior.xml")
    prior = Prior.from_xml(f"{REF}/{example}/prior.xml", varset)
    lik = create_likelihood(f"{REF}/{example}/likelihood.xml", varset)
    return prior, lik


def test_clustered_covariance_sampler_runs():
    prior, lik = _setup("multimodal_gaussians")
    cfg = PTConfig(
        num_samples=120,
        use_every_nth=2,
        num_chains=3,
        proposal_type="clustered_covariance",
        blocking_strategy="clustered_autoblock",
        adapt_proposal_samples=60,
        adapt_proposal_times=1,
        sample_clustering_num_clusters=2,
        seed=5,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    assert res["samples"].shape == (120, 3, 2)
    assert np.isfinite(res["log_likelihood"][:, -1]).all()
    # adaptation must have produced an assigner with 2 clusters
    assert s._assigner is not None
    assert s._assigner.num_clusters == 2


@pytest.mark.slow
def test_clustered_covariance_posterior():
    """Clustered proposal must sample the bimodal target correctly: both
    modes present with roughly equal mass (exact weights are 1/2, 1/2)."""
    prior, lik = _setup("multimodal_gaussians")
    cfg = PTConfig(
        num_samples=3000,
        use_every_nth=2,
        num_chains=4,
        proposal_type="clustered_covariance",
        adapt_proposal_samples=1000,
        adapt_proposal_times=2,
        sample_clustering_num_clusters=2,
        swapping_scheme="deterministic_even_odd",
        seed=7,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    x = res["samples"][1500:, -1, :]
    in_mode1 = x[:, 0] < 0
    frac = in_mode1.mean()
    assert 0.25 < frac < 0.75, frac
    m1 = x[in_mode1].mean(axis=0)
    m2 = x[~in_mode1].mean(axis=0)
    # modes at (-5,-5) and (5,5) (reference:
    # TestLikelihoodMultimodalGaussians.cpp:24-41)
    assert np.allclose(m1, [-5, -5], atol=0.6), m1
    assert np.allclose(m2, [5, 5], atol=0.6), m2


@pytest.mark.slow
def test_clustered_parity_statistics():
    """Mixing/acceptance parity for the documented batching deviations
    (shared block structure + one pooled spectral fit across chains vs the
    reference's per-chain structures, SamplerPTChain.cpp:109-173): after
    adaptation, the T=1 chain's mutate acceptance must sit near the
    reference's dimension-dependent target band (0.35 for 2-D blocks,
    Proposal.cpp:47-55, with the same EMA scale adaptation), the sampler
    must mix between the modes, and the effective sample size must be a
    non-degenerate fraction of the chain length."""
    from bcm3_tpu.analysis import effective_sample_size

    prior, lik = _setup("multimodal_gaussians")
    cfg = PTConfig(
        num_samples=2000,
        use_every_nth=2,
        num_chains=4,
        proposal_type="clustered_covariance",
        blocking_strategy="clustered_autoblock",
        adapt_proposal_samples=500,
        adapt_proposal_times=2,
        sample_clustering_num_clusters=2,
        swapping_scheme="deterministic_even_odd",
        seed=11,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()

    acc = res["acceptance"]
    rate_t1 = acc["accepted_mutate"][-1] / acc["attempted_mutate"][-1]
    # the scale EMA drives toward 0.35 (2-D blocks); accept a band around
    # it wide enough for the run length but excluding degenerate mixing
    assert 0.15 < rate_t1 < 0.6, rate_t1

    x = res["samples"][1000:, -1, :]
    # mode switches actually happen on the cold chain (exchange moves)
    signs = np.sign(x[:, 0])
    switches = np.sum(signs[1:] != signs[:-1])
    assert switches > 5, switches

    ess0 = effective_sample_size(x[:, 0])
    assert ess0 > 30, ess0

    # exchange acceptance at T=1 is gated by the power-3 ladder's large
    # top gap (T: 0.296 -> 1) on well-separated modes — the reference
    # would show the same for this ladder; require only that swaps do
    # land at a non-degenerate rate
    exch_t1 = acc["accepted_exchange"][-1] / max(acc["attempted_exchange"][-1], 1)
    assert exch_t1 > 0.01, exch_t1
