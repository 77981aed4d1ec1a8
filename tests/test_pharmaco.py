"""General-PK (pharmaco) likelihood tests
(reference: src/pharmaco/PharmacokineticModel.cpp,
PharmacoLikelihoodSingle.cpp, PharmacoLikelihoodPopulation.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg
import scipy.stats as st

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.likelihoods.pharmaco import (
    PharmacoLikelihoodPopulation,
    PharmacoLikelihoodSingle,
    PharmacoModelConfig,
    PharmacoSchedule,
    build_matrix,
    solve_patient,
)
from bcm3_tpu.likelihoods.poppk_synth import synthesize_trial
from bcm3_tpu.likelihoods.pk_single import select_patient
from bcm3_tpu.model.variables import VariableSet


def _np_matrix(cfg, ka, kex, kel, pf=0.0, pb=0.0, tr=0.0, da=0.0, mc=0.0, me=1.0):
    """Independent numpy mirror of the reference ConstructMatrix."""
    n = cfg.num_compartments
    A = np.zeros((n, n))
    A[0, 0] -= kex + ka
    if cfg.num_transit > 0:
        ft = cfg.first_transit_ix
        k = cfg.num_transit
        A[ft, 0] += ka
        if k > 2:
            for i in range(k - 1):
                A[ft + i, ft + i] -= tr
                A[ft + i + 1, ft + i] += tr
        A[ft + k - 1, ft + k - 1] = -tr
        A[1, ft + k - 1] += tr
    else:
        A[1, 0] += ka
    if cfg.use_peripheral:
        A[1, 1] -= pf
        A[2, 1] += pf
        A[1, 2] += pb
        A[2, 2] -= pb
    if cfg.use_biphasic:
        A[0, 0] -= da
        A[1, 0] += da
    if cfg.use_metabolite:
        m = cfg.metabolite_ix
        A[1, 1] -= mc
        A[m, 1] += mc
        A[m, m] -= me
    A[1, 1] -= kel
    return A


def test_build_matrix_variants():
    for cfg, kw in [
        (PharmacoModelConfig(), {}),
        (PharmacoModelConfig(use_peripheral=True), dict(pf=0.1, pb=0.05)),
        (PharmacoModelConfig(num_transit=3), dict(tr=0.7)),
        (PharmacoModelConfig(num_transit=2), dict(tr=0.7)),  # quirk path
        (PharmacoModelConfig(use_biphasic=True), dict(da=0.3)),
        (PharmacoModelConfig(use_metabolite=True), dict(mc=0.2)),
        (
            PharmacoModelConfig(
                use_peripheral=True, num_transit=4, use_metabolite=True
            ),
            dict(pf=0.1, pb=0.05, tr=0.7, mc=0.2),
        ),
    ]:
        got = np.asarray(
            build_matrix(
                cfg,
                jnp.asarray(0.5),
                jnp.asarray(0.02),
                jnp.asarray(0.3),
                peripheral_fwd=kw.get("pf", 0.0),
                peripheral_bwd=kw.get("pb", 0.0),
                transit_rate=kw.get("tr", 0.0),
                direct_absorption=kw.get("da", 0.0),
                metabolite_conversion=kw.get("mc", 0.0),
            )
        )
        expect = _np_matrix(cfg, 0.5, 0.02, 0.3, **kw)
        np.testing.assert_allclose(got, expect, atol=1e-12)


def test_solve_patient_matches_scipy():
    """Reference-style sequential expm propagation in scipy vs solve_patient."""
    cfg = PharmacoModelConfig(use_peripheral=True)
    ka, kex, kel, pf, pb = 0.4, 0.01, 0.2, 0.1, 0.07
    A = _np_matrix(cfg, ka, kex, kel, pf=pf, pb=pb)
    interval = 24.0
    doses = np.array([100.0, 100.0, 0.0, 150.0, 100.0])
    obs_t = np.array([2.0, 12.0, 30.0, 47.9, 70.0, 100.0])
    k_obs = np.ceil(obs_t / interval).astype(int) - 1
    obs_off = obs_t - k_obs * interval

    # oracle
    y = np.zeros(3)
    starts = []
    for d in doses:
        y = y + np.array([d, 0, 0])
        starts.append(y.copy())
        y = scipy.linalg.expm(A * interval) @ y
    expect = np.array(
        [(scipy.linalg.expm(A * off) @ starts[k])[1] for k, off in zip(k_obs, obs_off)]
    )

    traj, ok = solve_patient(
        jnp.asarray(A),
        jnp.asarray(interval),
        jnp.asarray(doses),
        jnp.asarray(k_obs),
        jnp.asarray(obs_off),
        jnp.asarray(1.0),
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(traj)[:, 1], expect, rtol=1e-8)


def _single_varset():
    vs = VariableSet()
    vs.add_variable("absorption", logspace=True)
    vs.add_variable("clearance", logspace=True)
    vs.add_variable("volume_of_distribution", logspace=True)
    vs.add_variable("additive_error_standard_deviation")
    vs.add_variable("proportional_error_standard_deviation")
    return vs


def test_pharmaco_single_oracle():
    trial, truth = synthesize_trial(num_patients=3, num_timepoints=14, seed=21)
    pid = trial.patient_ids[1]
    pid = pid.decode() if isinstance(pid, bytes) else str(pid)
    single = select_patient(trial, pid)
    vs = _single_varset()
    lik = PharmacoLikelihoodSingle(
        vs, single, "lapatinib", PharmacoModelConfig()
    )
    ka, cl, vod = 0.5, 18.0, 120.0
    sd, sd2 = 20.0, 0.08
    values = jnp.asarray([np.log10(ka), np.log10(cl), np.log10(vod), sd, sd2])
    got = float(lik.log_prob(values))

    # oracle: schedule from PharmacoSchedule + scipy expm
    cfg = PharmacoModelConfig()
    A = _np_matrix(cfg, ka, 0.0, cl / vod)
    s = PharmacoSchedule.from_trial(single)
    M = scipy.linalg.expm(A * s.interval[0])
    y = np.zeros(2)
    starts = []
    for d in s.dose_amount[0]:
        y = y + np.array([d, 0.0])
        starts.append(y.copy())
        y = M @ y
    conversion = (1e6 / 581.06) / vod
    expected = 0.0
    for i in range(len(s.obs_times[0])):
        if not s.obs_mask[0, i]:
            continue
        k, off = s.obs_interval[0, i], s.obs_offset[0, i]
        x = (scipy.linalg.expm(A * off) @ starts[k])[1] * conversion
        sig = sd + sd2 * max(x, 0.0)
        expected += st.t.logpdf(x, 4, loc=s.obs_values[0, i], scale=sig)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_pharmaco_population_random_effects():
    trial, truth = synthesize_trial(num_patients=4, num_timepoints=12, seed=31)
    P = 4
    vs = VariableSet()
    vs.add_variable("mean_absorption")
    vs.add_variable("sigma_absorption")
    vs.add_variable("mean_clearance")
    vs.add_variable("mean_volume_of_distribution")
    for j in range(P):
        vs.add_variable(f"p{j+1}_absorption")
    vs.add_variable("additive_error_standard_deviation")
    lik = PharmacoLikelihoodPopulation(
        vs, trial, "lapatinib", PharmacoModelConfig()
    )
    vals = np.zeros(vs.num_variables)
    vals[vs.index_of("mean_absorption")] = -0.3
    vals[vs.index_of("sigma_absorption")] = 0.2
    vals[vs.index_of("mean_clearance")] = np.log10(18.0)
    vals[vs.index_of("mean_volume_of_distribution")] = np.log10(120.0)
    for j in range(P):
        vals[vs.index_of(f"p{j+1}_absorption")] = 0.3 + 0.1 * j
    vals[vs.index_of("additive_error_standard_deviation")] = 25.0
    lp = float(lik.log_prob(jnp.asarray(vals)))
    assert np.isfinite(lp)

    # per-patient absorption must follow 10^QuantileNormal(u; mu, sigma)
    from scipy.stats import norm

    x, ok = lik.simulate_trajectories(jnp.asarray(vals))
    assert bool(np.all(np.asarray(ok)))
    # patient with larger u must have larger absorption -> different traj
    assert not np.allclose(np.asarray(x)[0], np.asarray(x)[3])

    # jit + vmap over a chain batch
    batch = jnp.asarray(np.tile(vals, (5, 1)))
    out = jax.jit(jax.vmap(lik.log_prob))(batch)
    np.testing.assert_allclose(np.asarray(out), lp, rtol=1e-10)


def test_pharmaco_single_from_xml(tmp_path):
    trial, _ = synthesize_trial(num_patients=2, num_timepoints=10, seed=41)
    pkfile = tmp_path / "pkdata.nc"
    trial.save(str(pkfile), "trial1", "lapatinib")
    pid = trial.patient_ids[0]
    pid = pid.decode() if isinstance(pid, bytes) else str(pid)
    xml = tmp_path / "likelihood.xml"
    xml.write_text(
        '<bcm_likelihood type="pharmaco_single">\n'
        f'  <pk_model drug="lapatinib" trial="trial1" patient="{pid}" '
        f'pkdata_file="{pkfile}"/>\n'
        "</bcm_likelihood>\n"
    )
    vs = _single_varset()
    lik = create_likelihood(str(xml), vs)
    lp = float(lik.log_prob(jnp.asarray([-0.3, 1.25, 2.08, 20.0, 0.08])))
    assert np.isfinite(lp)
