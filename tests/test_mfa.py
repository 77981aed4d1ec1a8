"""Mixture-of-t-factor-analyzers proposal fit (stats/mfa.py).

Validates the in-process replacement for the reference's R fitting
service (reference: ProposalGaussianMixtureFitInR.cpp + R/fit_proposal.r):
covariance recovery on a factor model, the BIC grid selection, the
high-dimensional regime where plain full-covariance GMM EM degenerates
(the reason this proposal type exists), and the sampler wiring.
"""

import numpy as np
import pytest

from bcm3_tpu.stats.gmm import fit_gmm_best_aic
from bcm3_tpu.stats.mfa import (
    MTFA_COMPONENTS,
    factor_ladder,
    fit_mtfa,
    fit_proposal_mtfa,
)


def _factor_data(rng, n, d, q, g=1, sep=6.0, nu=None):
    """Draw n samples from a g-component (t-)factor-analyzer mixture."""
    xs, labels = [], rng.integers(0, g, size=n)
    B = [rng.normal(size=(d, q)) for _ in range(g)]
    D = 0.05 + 0.1 * rng.random(d)
    mus = [np.full(d, sep * i) for i in range(g)]
    for j in range(n):
        i = labels[j]
        z = rng.normal(size=q)
        eps = rng.normal(size=d) * np.sqrt(D)
        x = mus[i] + B[i] @ z + eps
        if nu is not None:
            w = rng.chisquare(nu) / nu
            x = mus[i] + (x - mus[i]) / np.sqrt(w)
        xs.append(x)
    covs = [b @ b.T + np.diag(D) for b in B]
    return np.asarray(xs), np.asarray(mus), covs


def test_factor_ladder_matches_r():
    # R/fit_proposal.r:22-30 — Fibonacci values <= d-1, uniqued
    assert factor_ladder(2) == [1]
    assert factor_ladder(5) == [1, 2, 3]
    assert factor_ladder(10) == [1, 2, 3, 5, 8]
    assert factor_ladder(45) == [1, 2, 3, 5, 8, 13, 21, 34]
    assert factor_ladder(1) == [1]


def test_mtfa_single_component_covariance_recovery():
    rng = np.random.default_rng(0)
    x, mus, covs = _factor_data(rng, 2000, d=8, q=2)
    fit = fit_mtfa(x, g=1, q=2, rng=rng, n_kmeans=1, n_random=1)
    assert fit is not None
    est = fit.covariances()[0]
    # relative Frobenius error of the recovered covariance
    rel = np.linalg.norm(est - covs[0]) / np.linalg.norm(covs[0])
    assert rel < 0.15
    assert np.linalg.norm(fit.means[0] - mus[0]) < 0.5
    # Gaussian data: estimated dof should drift to the heavy cap
    assert fit.nu[0] > 20


def test_mtfa_heavy_tails_estimates_dof():
    rng = np.random.default_rng(1)
    x, _, _ = _factor_data(rng, 3000, d=6, q=1, nu=5.0)
    fit = fit_mtfa(x, g=1, q=1, rng=rng, n_kmeans=1, n_random=1)
    assert fit is not None
    assert 2.5 < fit.nu[0] < 12.0


def test_high_dim_proposal_fit_beats_plain_gmm():
    """d=45, n=500: full-covariance EM needs >1000 samples/component and
    degenerates; the factor parameterization must win on held-out density.
    This is the regime ProposalGaussianMixtureFitInR exists for."""
    rng = np.random.default_rng(2)
    d, q = 45, 3
    x, _, _ = _factor_data(rng, 700, d=d, q=q, g=2)
    train, test = x[:500], x[500:]

    mtfa_gmm = fit_proposal_mtfa(train, rng)
    assert mtfa_gmm is not None
    # all covariances valid (Cholesky succeeded inside from_params)
    assert np.all(np.isfinite(mtfa_gmm.chols))
    held_out_mtfa = mtfa_gmm.log_pdf(test).mean()

    plain = fit_gmm_best_aic(train, rng)
    if plain is not None:
        held_out_plain = plain.log_pdf(test).mean()
        assert held_out_mtfa > held_out_plain
    # the two well-separated components should be found
    assert mtfa_gmm.num_components >= 2


def test_component_grid_respects_sqrt_n():
    # k < sqrt(n) filter (R/fit_proposal.r:20)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 3))  # sqrt(20) ~ 4.47 -> k in {1,2,3}
    gmm = fit_proposal_mtfa(x, rng)
    assert gmm is not None
    assert gmm.num_components <= 3
    assert max(k for k in MTFA_COMPONENTS if k < np.sqrt(20)) == 3


def test_sampler_wiring_fit_in_r(tmp_path):
    """proposal_type=gaussian_mixture_fit_in_r runs end-to-end with
    adaptation (the reference accepts this type via CreateProposalInstance,
    SamplerPTChain.cpp:428-463)."""
    import os

    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet

    ref = "/root/reference/examples/banana"
    varset = VariableSet.from_xml(os.path.join(ref, "prior.xml"))
    prior = Prior.from_xml(os.path.join(ref, "prior.xml"), varset)
    lik = create_likelihood(os.path.join(ref, "likelihood.xml"), varset)

    from bcm3_tpu.sampler import PTConfig, SamplerPT

    cfg = PTConfig(
        num_samples=300,
        num_chains=4,
        proposal_type="gaussian_mixture_fit_in_r",
        adapt_proposal_samples=150,
        adapt_proposal_times=1,
        max_history_size=400,
        seed=7,
    )
    s = SamplerPT(prior, lik, cfg)
    assert s._use_mtfa_fit
    res = s.run()
    assert res["samples"].shape == (300, 4, 2)
    assert np.all(np.isfinite(res["samples"]))
    # adaptation actually ran through the mtfa fitter
    assert s.adaptations_done == 1
