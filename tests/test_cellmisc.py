"""Auxiliary cell-biology likelihood tests
(reference: src/likelihoods/LikelihoodCellCycleMarker.cpp,
LikelihoodMitosisTimeEstimation.cpp, LikelihoodIncucytePopulation.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.likelihoods.cellmisc import (
    IncucyteExperiment,
    IncucytePopulationLikelihood,
    MitosisTimeEstimationLikelihood,
    log_pdf_tnu3,
)
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.ode.delay import solve_dde_grid


def test_log_pdf_tnu3_matches_scipy():
    xs = np.array([-2.0, 0.0, 1.3, 5.0])
    got = np.asarray(log_pdf_tnu3(jnp.asarray(xs), 0.5, 2.0))
    expect = st.t.logpdf(xs, 3, loc=0.5, scale=2.0)
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_dde_solver_vs_analytic():
    """y'(t) = -y(t - 1), y=1 on [-1, 0]: known piecewise-polynomial
    solution y(t) = 1 - t on [0, 1], 1 - t + (t-1)^2/2 on [1, 2]."""
    f = lambda t, y, yd, args: -yd
    grid = jnp.linspace(0.0, 2.0, 401)
    res = solve_dde_grid(f, jnp.asarray([1.0]), grid, 1.0)
    assert bool(res.ok)
    ys = np.asarray(res.ys)[:, 0]
    t = np.asarray(grid)
    expect = np.where(t <= 1.0, 1.0 - t, 1.0 - t + 0.5 * (t - 1.0) ** 2)
    np.testing.assert_allclose(ys, expect, atol=2e-4)


def test_cell_cycle_marker(tmp_path):
    # generate data from the model's own piecewise form
    truth = [30.0, 60.0, 40.0, 6.0, 0.8, 0.3, 0.5, 0.4, 1.0, 0.02]
    i = np.arange(220, dtype=float)
    s_entry, s_dur, plat_dur = truth[0], truth[1], truth[2]
    plateau_t, mitosis_t = s_entry + s_dur, s_entry + s_dur + plat_dur
    x = np.full_like(i, truth[3])
    sel = (i > s_entry) & (i <= plateau_t)
    x[sel] = truth[3] + truth[4] * (i[sel] - s_entry)
    sel = (i > plateau_t) & (i <= mitosis_t)
    x[sel] = truth[3] + s_dur * truth[4] + (i[sel] - plateau_t) * truth[5]
    sel = i > mitosis_t
    x[sel] = (
        truth[3]
        + (s_dur * truth[4] + plat_dur * truth[5]) * truth[6]
        - truth[7] * (i[sel] - mitosis_t)
    )
    rng = np.random.default_rng(0)
    data = x + rng.standard_t(4, size=len(x)) * (1.0 + 0.02 * np.maximum(x, 0))

    fn = tmp_path / "track.tsv"
    header = "\t".join(["id"] + [str(int(v)) for v in i])
    row = "\t".join(["track0"] + [f"{v:.6f}" for v in data])
    fn.write_text(header + "\n" + row + "\n")

    vs = VariableSet()
    for name in (
        "S_entry_time", "S_duration", "plateau_duration", "base_signal",
        "S_signal_increase", "plateau_signal_increase",
        "mitosis_signal_fraction", "mitosis_signal_decrease",
        "additive_noise", "proportional_noise",
    ):
        vs.add_variable(name)
    lik = create_likelihood("cell_cycle_marker", vs, data_file=str(fn))
    lp_truth = float(lik.log_prob(jnp.asarray(truth)))
    assert np.isfinite(lp_truth)
    wrong = list(truth)
    wrong[0] = 80.0
    assert lp_truth > float(lik.log_prob(jnp.asarray(wrong)))


def test_mitosis_time_estimation():
    vs = VariableSet()
    vs.add_variable("mitosis_times_stdev")
    vs.add_variable("entry_time_stdev")
    vs.add_variable("trajectory_noise_stdev")
    tp = np.linspace(0, 10, 30)
    # observed boxcars from the model's own Sobol construction
    m = MitosisTimeEstimationLikelihood(vs, tp, np.zeros((30, 6)))
    truth = np.asarray([np.log10(3.0), np.log10(1.5), np.log10(0.2)])
    sim_t = m.sobol_values[:, 0] * 3.0
    start_t = m.sobol_values[:, 1] * 1.5
    obs = (
        (tp[None, :] >= start_t[:, None])
        & (tp[None, :] < (start_t + sim_t)[:, None])
    ).astype(float).T  # (T, ncell)
    m.observed = obs
    lp_truth = float(m.log_prob(jnp.asarray(truth)))
    lp_wrong = float(
        m.log_prob(jnp.asarray([np.log10(0.5), np.log10(6.0), np.log10(0.2)]))
    )
    assert np.isfinite(lp_truth)
    assert lp_truth > lp_wrong


def _incucyte_setup():
    tp = np.linspace(0.0, 96.0, 20)
    conc = np.array([0.1, 1.0, 10.0])
    e = IncucyteExperiment(
        timepoints=tp,
        concentrations=np.log10(conc),
        drug_confluence=np.full((20, 3, 4), 10.0),
        drug_apoptosis=np.full((20, 3, 4), 1.0),
        neg_confluence=np.full((20, 4), 20.0),
        neg_apoptosis=np.full((20, 4), 0.5),
        pos_confluence=np.full((20, 4), 5.0),
        pos_apoptosis=np.full((20, 4), 3.0),
        ctb=np.array([0.9, 0.5, 0.2]),
        treatment_time=24.0,
        seeding_density=1000.0,
        experiment_ix=0,
    )
    vs = VariableSet()
    names = [
        "log10_cell_size", "apoptotic_cell_size", "pao_apoptotic_cell_size",
        "debris_size", "apoptosis_marker_size", "pao_apoptosis_marker_size",
        "debris_apoptosis_marker_size", "proliferation_rate",
        "apoptosis_rate", "apoptosis_duration", "apoptosis_remove_rate",
        "drug_delay", "drug_effect_time", "pao_delay", "pao_effect_time",
        "pao_apoptosis_rate", "contact_inhibition_start",
        "contact_inhibition_max_confluence",
        "contact_inhibition_apoptosis_rate", "cell_preadherence_size",
        "cell_adherence_time", "starting_dead_cell_fraction",
        "seeding_density_deviation_1",
        "drug_proliferation_rate_1", "drug_proliferation_rate_2",
        "drug_proliferation_rate_3",
        "drug_apoptosis_rate_1", "drug_apoptosis_rate_2",
        "drug_apoptosis_rate_3",
        "sigma_confluence", "sigma_apoptosis_marker", "sigma_ctb",
    ]
    for n in names:
        vs.add_variable(n)
    vals = {
        "log10_cell_size": np.log10(300.0),
        "apoptotic_cell_size": 0.5,
        "pao_apoptotic_cell_size": 0.5,
        "debris_size": 0.2,
        "apoptosis_marker_size": 0.8,
        "pao_apoptosis_marker_size": 0.8,
        "debris_apoptosis_marker_size": 0.3,
        "proliferation_rate": 0.03,
        "apoptosis_rate": 0.1,
        "apoptosis_duration": 6.0,
        "apoptosis_remove_rate": 0.05,
        "drug_delay": 1.0,
        "drug_effect_time": 6.0,
        "pao_delay": 1.0,
        "pao_effect_time": 3.0,
        "pao_apoptosis_rate": 0.2,
        "contact_inhibition_start": 70.0,
        "contact_inhibition_max_confluence": 100.0,
        "contact_inhibition_apoptosis_rate": 0.0,
        "cell_preadherence_size": 1.3,
        "cell_adherence_time": 4.0,
        "starting_dead_cell_fraction": 0.02,
        "seeding_density_deviation_1": 0.0,
        "drug_proliferation_rate_1": 0.1,
        "drug_proliferation_rate_2": 0.2,
        "drug_proliferation_rate_3": 0.3,
        "drug_apoptosis_rate_1": 0.001,
        "drug_apoptosis_rate_2": 0.002,
        "drug_apoptosis_rate_3": 0.005,
        "sigma_confluence": 2.0,
        "sigma_apoptosis_marker": 0.5,
        "sigma_ctb": 0.1,
    }
    values = np.array([vals[n] for n in names])
    return IncucytePopulationLikelihood(vs, [e]), values


def test_incucyte_finite_and_jittable():
    lik, values = _incucyte_setup()
    lp = float(lik.log_prob(jnp.asarray(values)))
    assert np.isfinite(lp)
    lp_jit = float(jax.jit(lik.log_prob)(jnp.asarray(values)))
    np.testing.assert_allclose(lp, lp_jit, rtol=1e-10)
    # stronger drug effect must change the likelihood
    v2 = values.copy()
    ix = lik.varset.index_of("drug_proliferation_rate_3")
    v2[ix] = 0.9
    assert abs(float(lik.log_prob(jnp.asarray(v2))) - lp) > 1e-6


def test_incucyte_population_dynamics():
    lik, values = _incucyte_setup()
    e = lik.experiments[0]
    ys, ok, _, _, _ = lik._simulate_wells(jnp.asarray(values), e)
    assert bool(ok)
    ys = np.asarray(ys)
    # negative control grows; highest drug concentration grows slower
    assert ys[0, 0, -1] > ys[0, 0, 0]
    assert ys[2 + 2, 0, -1] < ys[0, 0, -1]


def test_dde_adaptive_vs_analytic():
    """Adaptive solver on the same problem as test_dde_solver_vs_analytic
    but a 8x coarser output grid: error control must hold accuracy that
    fixed-grid RK4 only reaches by grid density."""
    from bcm3_tpu.ode.delay import solve_dde_adaptive

    f = lambda t, y, yd, args: -yd
    grid = jnp.linspace(0.0, 2.0, 51)
    res = solve_dde_adaptive(
        f, jnp.asarray([1.0]), grid, 1.0, rtol=1e-8, atol=1e-10,
        trips_per_interval=12,
    )
    assert bool(res.ok)
    ys = np.asarray(res.ys)[:, 0]
    t = np.asarray(grid)
    expect = np.where(t <= 1.0, 1.0 - t, 1.0 - t + 0.5 * (t - 1.0) ** 2)
    np.testing.assert_allclose(ys, expect, atol=1e-7)


def test_dde_adaptive_convergence_delayed_logistic():
    """Convergence check against a dense-grid oracle on the delayed
    logistic (Hutchinson) equation, which oscillates: the adaptive
    solver at the reference's incucyte tolerances
    (rel 1e-6 / abs 1e-2 scaled, LikelihoodIncucytePopulation.cpp:131)
    must track the oracle on a coarse output grid."""
    from bcm3_tpu.ode.delay import solve_dde_adaptive, solve_dde_grid

    r, tau = 1.8, 1.0

    def f(t, y, yd, args):
        return r * y * (1.0 - yd)

    y0 = jnp.asarray([0.1])
    # oracle: fixed-grid RK4 at very high density
    dense = jnp.linspace(0.0, 20.0, 16001)
    oracle = solve_dde_grid(f, y0, dense, tau)
    assert bool(oracle.ok)

    coarse = jnp.linspace(0.0, 20.0, 201)
    res = solve_dde_adaptive(
        f, y0, coarse, tau, rtol=1e-6, atol=1e-8, trips_per_interval=10
    )
    assert bool(res.ok)
    oracle_on_coarse = np.interp(
        np.asarray(coarse), np.asarray(dense), np.asarray(oracle.ys)[:, 0]
    )
    got = np.asarray(res.ys)[:, 0]
    scale = np.abs(oracle_on_coarse).max()
    assert np.max(np.abs(got - oracle_on_coarse)) < 2e-4 * scale


def test_dde_adaptive_budget_exhaustion_fails_soft():
    from bcm3_tpu.ode.delay import solve_dde_adaptive

    # stiff-ish fast decay needs more substeps than the budget allows at
    # a tight tolerance -> trajectory must fail (NaN/ok=False), not hang
    f = lambda t, y, yd, args: -4000.0 * y + yd
    grid = jnp.linspace(0.0, 1.0, 6)
    res = solve_dde_adaptive(
        f, jnp.asarray([1.0]), grid, 10.0, rtol=1e-10, atol=1e-12,
        trips_per_interval=3,
    )
    assert not bool(res.ok)
