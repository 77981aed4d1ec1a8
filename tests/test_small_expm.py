"""Unrolled small-matrix expm + budget DDE solver tests (round-5 fast
paths for the pharmaco and incucyte likelihoods)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from bcm3_tpu.ode.linear_pk import small_expm


@pytest.mark.parametrize("n", [2, 3, 4, 6])
@pytest.mark.parametrize("scale", [0.1, 1.0, 30.0, 300.0])
def test_small_expm_matches_scipy(n, scale):
    rng = np.random.default_rng(n * 7 + int(scale))
    A = rng.normal(size=(n, n)) * scale / n
    E = np.asarray(small_expm(jnp.asarray(A)))
    ref = scipy.linalg.expm(A)
    np.testing.assert_allclose(E, ref, rtol=1e-8, atol=1e-12)


def test_small_expm_vmapped_and_jitted():
    rng = np.random.default_rng(3)
    As = rng.normal(size=(32, 3, 3)) * 2.0
    Es = np.asarray(jax.jit(jax.vmap(small_expm))(jnp.asarray(As)))
    for i in range(32):
        np.testing.assert_allclose(
            Es[i], scipy.linalg.expm(As[i]), rtol=1e-8, atol=1e-12
        )


def test_small_expm_pk_matrix():
    """The pharmaco bench shape: 2x2 lower-triangular dosing matrix
    scaled by a 24 h interval (norm ~ 30 -> several squarings)."""
    ka, kel = 1.25, 0.15
    A = np.array([[-ka, 0.0], [ka, -kel]]) * 24.0
    E = np.asarray(small_expm(jnp.asarray(A)))
    np.testing.assert_allclose(E, scipy.linalg.expm(A), rtol=1e-9)


def test_pharmaco_solve_patient_uses_fast_expm():
    """End-to-end: pharmaco log_prob equals the generic-expm evaluation."""
    from bcm3_tpu.likelihoods import pharmaco as ph
    from bcm3_tpu.likelihoods.pharmaco import (
        PharmacoLikelihoodPopulation,
        PharmacoModelConfig,
    )
    from bcm3_tpu.likelihoods.poppk_synth import synthesize_trial
    from bcm3_tpu.model.variables import VariableSet

    P = 3
    trial, _ = synthesize_trial(num_patients=P, num_timepoints=10, seed=31)
    vs = VariableSet()
    for n in ("mean_absorption", "sigma_absorption", "mean_clearance",
              "mean_volume_of_distribution"):
        vs.add_variable(n)
    for j in range(P):
        vs.add_variable(f"p{j+1}_absorption")
    vs.add_variable("additive_error_standard_deviation")
    lik = PharmacoLikelihoodPopulation(
        vs, trial, "lapatinib", PharmacoModelConfig()
    )
    vals = np.zeros(vs.num_variables)
    vals[0], vals[1] = -0.3, 0.2
    vals[2], vals[3] = np.log10(18.0), np.log10(120.0)
    for j in range(P):
        vals[4 + j] = 0.3 + 0.1 * j
    vals[-1] = 25.0
    lp_fast = float(lik.log_prob(jnp.asarray(vals)))
    orig = ph.expm
    try:
        ph.expm = ph._scipy_expm
        lp_generic = float(lik.log_prob(jnp.asarray(vals)))
    finally:
        ph.expm = orig
    assert np.isfinite(lp_fast)
    np.testing.assert_allclose(lp_fast, lp_generic, rtol=1e-9)


def test_dde_budget_matches_adaptive_intervals():
    """The whole-trajectory budget DDE form gives the per-interval
    adaptive form's results on the delayed-logistic benchmark."""
    from bcm3_tpu.ode.delay import solve_dde_adaptive, solve_dde_budget

    def rhs(t, y, yd, args):
        return 0.8 * y * (1.0 - yd)

    y0 = jnp.asarray([0.1])
    grid = jnp.asarray(np.linspace(0.0, 20.0, 128))
    a = solve_dde_adaptive(rhs, y0, grid, 1.0, rtol=1e-6, atol=1e-8)
    b = solve_dde_budget(
        rhs, y0, grid, 1.0, rtol=1e-6, atol=1e-8, total_trips=512
    )
    assert bool(a.ok) and bool(b.ok)
    np.testing.assert_allclose(
        np.asarray(b.ys), np.asarray(a.ys), rtol=1e-5, atol=1e-8
    )


def test_dde_budget_exhaustion_fails_soft():
    from bcm3_tpu.ode.delay import solve_dde_budget

    def rhs(t, y, yd, args):
        return 50.0 * y * (1.0 - yd)  # fast dynamics, tiny budget

    y0 = jnp.asarray([0.1])
    grid = jnp.asarray(np.linspace(0.0, 20.0, 128))
    res = solve_dde_budget(
        rhs, y0, grid, 1.0, rtol=1e-10, atol=1e-12, total_trips=16
    )
    assert not bool(res.ok)
    assert np.isnan(np.asarray(res.ys)).any()


def test_incucyte_budget_equals_interval_form():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_cellmisc import _incucyte_setup

    lik, values = _incucyte_setup()
    lp_ring = float(lik.log_prob(jnp.asarray(values)))  # default = ring
    lik.solver = "fixed"
    lp_fixed = float(lik.log_prob(jnp.asarray(values)))
    lik.solver = "budget"
    lp_budget = float(lik.log_prob(jnp.asarray(values)))
    assert np.isfinite(lp_ring)
    # ring and grid-buffer fixed-grid RK4 are the same arithmetic
    np.testing.assert_allclose(lp_ring, lp_fixed, rtol=1e-12)
    # the adaptive BS3+Hermite budget controller agrees to solver error
    np.testing.assert_allclose(lp_ring, lp_budget, rtol=1e-4)
