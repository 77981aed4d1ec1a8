"""Pallas PopPK interval-kernel tests (bcm3_tpu/ops/poppk_pallas.py).

On CPU the kernel runs in interpreter mode; the same code path compiles
to a fused Mosaic kernel on TPU (verified by the bench workload)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcm3_tpu.ops.poppk_pallas import (
    eligible,
    propagate_intervals_one_compartment,
    propagate_intervals_reference,
)


def _rand_problem(B=16, P=16, K=9, seed=0):
    rng = np.random.default_rng(seed)
    ka = jnp.asarray(rng.uniform(0.5, 2.0, (B, P)))
    ke = jnp.asarray(rng.uniform(0.01, 0.1, (B, P)))
    kel = jnp.asarray(rng.uniform(0.1, 0.5, (B, P)))
    init = rng.uniform(100, 200, P)
    interval = rng.uniform(12, 24, P)
    dose = rng.uniform(50, 150, (P, K))
    dose[:, 3] = 0.0  # a skipped dose
    return ka, ke, kel, init, interval, dose


def test_kernel_matches_scan_oracle():
    ka, ke, kel, init, interval, dose = _rand_problem()
    g1, c1 = propagate_intervals_one_compartment(ka, ke, kel, init, interval, dose)
    g2, c2 = propagate_intervals_reference(
        ka, ke, kel,
        jnp.asarray(init, ka.dtype), jnp.asarray(interval, ka.dtype),
        jnp.asarray(dose, ka.dtype),
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6, atol=1e-9)


def test_eligibility():
    assert eligible(16) and eligible(8) and eligible(128)
    assert not eligible(10)
    with pytest.raises(ValueError):
        ka, ke, kel, init, interval, dose = _rand_problem(B=3, P=10)
        propagate_intervals_one_compartment(ka, ke, kel, init, interval, dose)


def test_poppk_log_prob_batched_matches_vmap(tmp_path, monkeypatch):
    """The engine-facing batched path (Pallas) equals vmap(log_prob)."""
    import os

    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.likelihoods.poppk_synth import (
        synthesize_trial,
        write_poppk_likelihood_xml,
        write_poppk_prior_xml,
    )
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet

    trial, _ = synthesize_trial(num_patients=16, num_timepoints=12, seed=1)
    pkdata = os.path.join(tmp_path, "pk.nc")
    trial.save(pkdata, "T1", "lapatinib")
    prior_xml = os.path.join(tmp_path, "prior.xml")
    lik_xml = os.path.join(tmp_path, "lik.xml")
    write_poppk_prior_xml(prior_xml, 16, "one")
    write_poppk_likelihood_xml(lik_xml, pkdata, "T1", "lapatinib", "one")
    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)

    monkeypatch.setenv("BCM3_POPPK_PALLAS", "1")
    xs = prior.sample(jax.random.PRNGKey(0), (8,))  # 8*16 = 128 lanes
    ref = jax.vmap(lik.log_prob)(xs)
    got = lik.log_prob_batched(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-8)

    # ineligible batch (B*P not a multiple of 128) falls back to vmap
    xs3 = xs[:3]
    np.testing.assert_allclose(
        np.asarray(lik.log_prob_batched(xs3)),
        np.asarray(jax.vmap(lik.log_prob)(xs3)),
        rtol=1e-12,
    )


def _transit_setup(tmp_path, P=4, T=10):
    import os

    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.likelihoods.poppk_synth import (
        synthesize_trial,
        write_poppk_likelihood_xml,
        write_poppk_prior_xml,
    )
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet

    trial, truth = synthesize_trial(num_patients=P, num_timepoints=T, seed=7)
    pk = os.path.join(tmp_path, "pkdata.nc")
    trial.save(pk, "TRIAL1", "lapatinib")
    write_poppk_prior_xml(os.path.join(tmp_path, "prior.xml"), P, "one_transit")
    write_poppk_likelihood_xml(
        os.path.join(tmp_path, "lik.xml"), pk, "TRIAL1", "lapatinib",
        "one_transit",
    )
    vs = VariableSet.from_xml(os.path.join(tmp_path, "prior.xml"))
    prior = Prior.from_xml(os.path.join(tmp_path, "prior.xml"), vs)
    lik = create_likelihood(os.path.join(tmp_path, "lik.xml"), vs)
    return prior, lik


def test_transit_pallas_matches_vmap_path(tmp_path, monkeypatch):
    """The fused transit kernel (ops/transit_pallas.py) must agree with
    the solve_at_times_budget likelihood path — same tableau, controller
    and soft-fail semantics (interpreter mode on CPU)."""
    prior, lik = _transit_setup(str(tmp_path))
    m = lik.model
    xs = prior.sample(jax.random.PRNGKey(2), (6,))

    ref = np.asarray(jax.vmap(m.log_prob)(xs))

    monkeypatch.setenv("BCM3_TRANSIT_PALLAS", "1")
    got = np.asarray(m.log_prob_batched(xs))

    fin_r, fin_g = np.isfinite(ref), np.isfinite(got)
    # soft-fail sets must agree (same budget, same controller)
    np.testing.assert_array_equal(fin_r, fin_g)
    if fin_r.any():
        np.testing.assert_allclose(
            got[fin_r], ref[fin_r], rtol=5e-3, atol=1e-2
        )
