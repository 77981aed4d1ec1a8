"""fISA signaling-network tests (reference: src/fISA/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcm3_tpu.fisa.network import SignalingNetwork
from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.variables import VariableSet

SBML_NS = "http://www.sbml.org/sbml/level2/version4"
CD = "http://www.sbml.org/2001/ns/celldesigner"


def _species(sid, name, cls, notes=""):
    notes_xml = (
        f"<notes><body xmlns='http://www.w3.org/1999/xhtml'>"
        f"<p>{notes}</p></body></notes>"
        if notes
        else ""
    )
    return (
        f'<species id="{sid}" name="{name}" initialAmount="0">'
        f"{notes_xml}"
        f"<annotation><celldesigner:extension xmlns:celldesigner='{CD}'>"
        f"<celldesigner:speciesIdentity>"
        f"<celldesigner:class>{cls}</celldesigner:class>"
        f"</celldesigner:speciesIdentity>"
        f"</celldesigner:extension></annotation></species>"
    )


def _reaction(rid, reactant, product, positive=True):
    rtype = "POSITIVE_INFLUENCE" if positive else "NEGATIVE_INFLUENCE"
    return (
        f'<reaction id="{rid}">'
        f"<annotation><celldesigner:extension xmlns:celldesigner='{CD}'>"
        f"<celldesigner:reactionType>{rtype}</celldesigner:reactionType>"
        f"</celldesigner:extension></annotation>"
        f'<listOfReactants><speciesReference species="{reactant}"/></listOfReactants>'
        f'<listOfProducts><speciesReference species="{product}"/></listOfProducts>'
        f"</reaction>"
    )


# EGFR -> ERK -> proliferation, with a drug inhibiting ERK's activity
MODEL = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4"><model id="net">
<listOfSpecies>
{_species("s1", "EGFR", "PROTEIN")}
{_species("s2", "ERK", "PROTEIN")}
{_species("s3", "proliferation", "PHENOTYPE")}
{_species("s4", "drugX", "DRUG", "inhibit activity")}
</listOfSpecies>
<listOfReactions>
{_reaction("r1", "s1", "s2")}
{_reaction("r2", "s2", "s3")}
{_reaction("r3", "s4", "s2", positive=False)}
</listOfReactions>
</model></sbml>
"""


def _varset():
    vs = VariableSet()
    for name in (
        "base_EGFR",
        "strength_EGFR_ERK",
        "strength_ERK_proliferation",
        "maxinhib_drugX_ERK",
    ):
        vs.add_variable(name)
    return vs


def _write_model(tmp_path):
    p = tmp_path / "net.xml"
    p.write_text(MODEL)
    return str(p)


def test_network_steady_state(tmp_path):
    vs = _varset()
    net = SignalingNetwork.from_sbml(_write_model(tmp_path), vs, "minmax")
    assert net.num_molecules == 4
    tv = jnp.asarray([0.7, 0.9, 0.8, 0.6])
    n = net.num_molecules
    preset = jnp.full((n,), jnp.nan)
    preset = preset.at[net.molecule_ix_by_name("drugX")].set(0.0)
    act = net.calculate(tv, jnp.ones((n,)), preset)
    a = np.asarray(act)
    egfr = 0.7  # base, clipped [0,1]
    erk = 0.9 * egfr
    prol = 0.8 * erk
    np.testing.assert_allclose(a[net.molecule_ix_by_name("EGFR")], egfr, rtol=1e-10)
    np.testing.assert_allclose(a[net.molecule_ix_by_name("ERK")], erk, rtol=1e-10)
    np.testing.assert_allclose(
        a[net.molecule_ix_by_name("proliferation")], prol, rtol=1e-10
    )


def test_drug_inhibits_downstream(tmp_path):
    """inhibit-activity drug on ERK attenuates ERK->proliferation but not
    ERK itself (reference: CalculateActivationInput drug comment)."""
    vs = _varset()
    net = SignalingNetwork.from_sbml(_write_model(tmp_path), vs, "minmax")
    tv = jnp.asarray([0.7, 0.9, 0.8, 0.5])  # maxinhib = 0.5
    n = net.num_molecules
    preset = jnp.full((n,), jnp.nan)
    preset = preset.at[net.molecule_ix_by_name("drugX")].set(1.0)
    act = np.asarray(net.calculate(tv, jnp.ones((n,)), preset))
    erk = 0.9 * 0.7
    # drug signal for inhibiting linear drug: 1 - act*maxinhib = 0.5
    prol = 0.8 * erk * 0.5
    np.testing.assert_allclose(act[net.molecule_ix_by_name("ERK")], erk, rtol=1e-10)
    np.testing.assert_allclose(
        act[net.molecule_ix_by_name("proliferation")], prol, rtol=1e-8
    )


def _feedback_model(tmp_path, positive=False):
    """A <-> B feedback loop (negative by default: A -> B -| A)."""
    model = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4"><model id="net">
<listOfSpecies>
{_species("s1", "A", "PROTEIN")}
{_species("s2", "B", "PROTEIN")}
</listOfSpecies>
<listOfReactions>
{_reaction("r1", "s1", "s2")}
{_reaction("r2", "s2", "s1", positive=positive)}
</listOfReactions>
</model></sbml>"""
    p = tmp_path / "fb.xml"
    p.write_text(model)
    return str(p)


def _logistic_fixed(x):
    return np.where(x > 3.5, 1.0, 1.0 / (1.0 + np.exp(-9.19024 * (x - 0.5))))


def test_feedback_component(tmp_path):
    """A -> B -| A feedback loop must converge via Newton iteration
    (logistic activation limit — the only one the reference allows for
    feedback loops, SignalingNetwork.cpp:524-527)."""
    vs = VariableSet()
    vs.add_variable("base_A")
    vs.add_variable("strength_A_B")
    vs.add_variable("strength_B_A")
    net = SignalingNetwork.from_sbml(
        _feedback_model(tmp_path), vs, "logistic"
    )
    tv = jnp.asarray([0.8, 0.9, 0.5])
    act = np.asarray(
        net.calculate(tv, jnp.ones((2,)), jnp.full((2,), jnp.nan))
    )
    # fixed point: a = sigma(0.8 - 0.5 b), b = sigma(0.9 a)
    a, b = act
    np.testing.assert_allclose(a, _logistic_fixed(0.8 - 0.5 * b), atol=1e-6)
    np.testing.assert_allclose(b, _logistic_fixed(0.9 * a), atol=1e-6)


def test_feedback_requires_logistic(tmp_path):
    """Feedback + minmax activation limit is an error in the reference
    (SignalingNetwork.cpp:524-527)."""
    vs = VariableSet()
    vs.add_variable("base_A")
    vs.add_variable("strength_A_B")
    vs.add_variable("strength_B_A")
    with pytest.raises(ValueError, match="logistic"):
        SignalingNetwork.from_sbml(_feedback_model(tmp_path), vs, "minmax")


def test_fisa_likelihood_end_to_end(tmp_path):
    import h5py

    model_path = _write_model(tmp_path)
    # data: 3 cell lines; observed proliferation from truth
    cell_lines = ["c1", "c2", "c3"]
    base_egfr = np.array([0.5, 0.7, 0.9])
    truth = dict(strength_EGFR_ERK=0.9, strength_ERK_proliferation=0.8)
    obs = 0.8 * 0.9 * base_egfr
    with h5py.File(tmp_path / "data.nc", "w") as f:
        g = f.create_group("exp1")
        g.create_dataset(
            "cell_lines", data=np.array(cell_lines, dtype="S8")
        )
        g.create_dataset("egfr_levels", data=base_egfr)
        g.create_dataset("prolif_data", data=obs[None, :])

    lik_xml = tmp_path / "likelihood.xml"
    lik_xml.write_text(
        '<bcm_likelihood type="fISA">\n'
        '<experiment name="exp1" model_file="net.xml" data_file="data.nc">\n'
        '  <condition species_name="EGFR" data_name="egfr_levels"/>\n'
        '  <data species_name="proliferation" data_name="prolif_data"\n'
        '    likelihood_function="normal" use_base="false" use_scale="false"\n'
        '    scale_var_with_mean="false" sd="0.05"/>\n'
        "</experiment>\n"
        "</bcm_likelihood>\n"
    )
    vs = _varset()
    lik = create_likelihood(str(lik_xml), vs)
    vals = jnp.asarray([0.7, 0.9, 0.8, 0.0])
    lp_truth = float(lik.log_prob(vals))
    assert np.isfinite(lp_truth)
    lp_wrong = float(lik.log_prob(jnp.asarray([0.7, 0.3, 0.8, 0.0])))
    assert lp_truth > lp_wrong
    # jit + vmap over chains
    batch = jnp.stack([vals, vals * 0.9])
    out = np.asarray(jax.jit(jax.vmap(lik.log_prob))(batch))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], lp_truth, rtol=1e-10)


# ---------------------------------------------------------------------------
# incucyte_sequential experiments
# (reference: fISAExperimentIncucyteSequential.cpp)
# ---------------------------------------------------------------------------

INCUCYTE_MODEL = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4"><model id="net">
<listOfSpecies>
{_species("s1", "EGFR", "PROTEIN")}
{_species("s2", "ERK", "PROTEIN")}
{_species("s3", "proliferation", "PHENOTYPE")}
{_species("s4", "apoptosis", "PHENOTYPE")}
{_species("s5", "drugX", "DRUG", "inhibit activity")}
</listOfSpecies>
<listOfReactions>
{_reaction("r1", "s1", "s2")}
{_reaction("r2", "s2", "s3")}
{_reaction("r3", "s2", "s4", positive=False)}
{_reaction("r4", "s5", "s2", positive=False)}
</listOfReactions>
</model></sbml>
"""


def _incucyte_varset():
    vs = VariableSet()
    for name in (
        "base_EGFR",
        "base_apoptosis",
        "strength_EGFR_ERK",
        "strength_ERK_proliferation",
        "strength_ERK_apoptosis",
        "maxinhib_drugX_ERK",
    ):
        vs.add_variable(name)
    return vs


def _expected_prolif_apop(tv, egfr, conc):
    """Analytic steady state of the INCUCYTE_MODEL chain."""
    b_eg, b_ap, s_ee, s_ep, s_ea, mi = tv
    erk = np.clip(s_ee * egfr, 0, 1)
    drug_signal = 1.0 - conc * mi
    prolif = np.clip(s_ep * erk * drug_signal, 0, 1)
    apop = np.clip(b_ap - s_ea * erk * drug_signal, 0, 1)
    return prolif, apop


def _write_incucyte_setup(tmp_path, relative=False):
    import h5py

    (tmp_path / "inet.xml").write_text(INCUCYTE_MODEL)
    cell_lines = ["c1", "c2"]
    egfr = np.array([0.5, 0.9])
    concs = np.array([0.0, 0.4, 0.8])
    tv = np.array([0.6, 0.9, 0.9, 0.8, 0.7, 0.6])

    with h5py.File(tmp_path / "idata.nc", "w") as f:
        for name in ("baseline", "incu"):
            g = f.create_group(name)
            g.create_dataset("cell_lines", data=np.array(cell_lines, dtype="S8"))
            g.create_dataset("egfr_levels", data=egfr)

    # mixture table: rows = cell_line * n_conc + conc; per row 3 components
    # of (mup, mua, cov00, cov01, cov11) then 3 weights
    rows = []
    expected = np.zeros((2, 3, 2))
    for i in range(2):
        base_p = _expected_prolif_apop(tv, egfr[i], 0.0)[0] if relative else 0.0
        for ci, c in enumerate(concs):
            p, a = _expected_prolif_apop(tv, egfr[i], c)
            expected[i, ci] = (p - base_p, a)
            row = []
            for ki, (dp, w) in enumerate([(0.0, 0.6), (0.05, 0.4), (0.0, 0.0)]):
                row += [p - base_p + dp, a - dp, 0.01, 0.002, 0.01]
            row += [0.6, 0.4, 0.0]
            rows.append("\t".join(str(x) for x in row))
    (tmp_path / "mix.tsv").write_text("\n".join(rows) + "\n")

    rel_data = (
        '<data data_file_base="mix.tsv" type="relative" '
        'relative_reference="baseline"/>'
        if relative
        else '<data data_file_base="mix.tsv"/>'
    )
    baseline_exp = (
        '<experiment name="baseline" model_file="inet.xml" data_file="idata.nc">'
        '<condition species_name="EGFR" data_name="egfr_levels"/>'
        "</experiment>"
        if relative
        else ""
    )
    (tmp_path / "ilik.xml").write_text(
        '<bcm_likelihood type="fISA">'
        f"{baseline_exp}"
        '<experiment name="incu" type="incucyte_sequential" '
        'model_file="inet.xml" data_file="idata.nc">'
        '<drug_range species_name="drugX" concentrations="0.0;0.4;0.8"/>'
        '<condition species_name="EGFR" data_name="egfr_levels"/>'
        f"{rel_data}"
        "</experiment>"
        "</bcm_likelihood>"
    )
    return tv, expected


def _bivariate_t_mixture_logp(x, y, row):
    """Oracle for the reference's 3-component bivariate-t(nu=3) mixture
    (EvaluateCellLine:311-330)."""
    total = -np.inf
    for ki in range(3):
        mup, mua, c00, c01, c11 = row[ki * 5 : ki * 5 + 5]
        w = row[15 + ki]
        if w <= 0:
            continue
        cov = np.array([[c00, c01], [c01, c11]])
        iv = np.linalg.inv(cov)
        tx, ta = x - mup, y - mua
        q = iv[0, 0] * tx * tx + iv[1, 1] * ta * ta + 2 * iv[0, 1] * tx * ta
        kp = (
            np.log(w)
            - np.log(2 * np.pi * np.sqrt(np.linalg.det(cov)))
            - 2.5 * np.log1p(q / 3.0)
        )
        total = np.logaddexp(total, kp)
    return total


def test_incucyte_sequential_oracle(tmp_path):
    tv, expected = _write_incucyte_setup(tmp_path, relative=False)
    vs = _incucyte_varset()
    lik = create_likelihood(str(tmp_path / "ilik.xml"), vs)
    lp = float(lik.log_prob(jnp.asarray(tv)))

    rows = [
        [float(x) for x in line.split("\t")]
        for line in (tmp_path / "mix.tsv").read_text().strip().split("\n")
    ]
    want = 0.0
    for i in range(2):
        for ci in range(3):
            p, a = expected[i, ci]
            want += _bivariate_t_mixture_logp(p, a, rows[i * 3 + ci])
    np.testing.assert_allclose(lp, want, rtol=1e-8)

    # jittable / vmappable over chains
    batch = jnp.stack([jnp.asarray(tv), jnp.asarray(tv) * 0.95])
    out = np.asarray(jax.jit(jax.vmap(lik.log_prob))(batch))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], want, rtol=1e-8)


def test_incucyte_sequential_relative(tmp_path):
    """type="relative" subtracts the stored single-condition
    proliferation (reference :279-282)."""
    tv, expected = _write_incucyte_setup(tmp_path, relative=True)
    vs = _incucyte_varset()
    lik = create_likelihood(str(tmp_path / "ilik.xml"), vs)
    assert len(lik.model.experiments) == 2
    lp = float(lik.log_prob(jnp.asarray(tv)))

    rows = [
        [float(x) for x in line.split("\t")]
        for line in (tmp_path / "mix.tsv").read_text().strip().split("\n")
    ]
    want = 0.0
    for i in range(2):
        for ci in range(3):
            p, a = expected[i, ci]
            want += _bivariate_t_mixture_logp(p, a, rows[i * 3 + ci])
    np.testing.assert_allclose(lp, want, rtol=1e-8)


def test_incucyte_sequential_nan_pair_skipped(tmp_path):
    """Pairs with NaN second-component mean contribute zero
    (reference :312)."""
    tv, expected = _write_incucyte_setup(tmp_path, relative=False)
    lines = (tmp_path / "mix.tsv").read_text().strip().split("\n")
    rows = [[float(x) for x in line.split("\t")] for line in lines]
    rows[0][5] = np.nan  # second component mup of (c1, conc 0)
    (tmp_path / "mix.tsv").write_text(
        "\n".join("\t".join(str(x) for x in r) for r in rows) + "\n"
    )
    vs = _incucyte_varset()
    lik = create_likelihood(str(tmp_path / "ilik.xml"), vs)
    lp = float(lik.log_prob(jnp.asarray(tv)))
    want = 0.0
    for i in range(2):
        for ci in range(3):
            if i == 0 and ci == 0:
                continue
            p, a = expected[i, ci]
            want += _bivariate_t_mixture_logp(p, a, rows[i * 3 + ci])
    np.testing.assert_allclose(lp, want, rtol=1e-8)


def test_incucyte_observed_and_modeled_data(tmp_path):
    tv, expected = _write_incucyte_setup(tmp_path, relative=False)
    vs = _incucyte_varset()
    lik = create_likelihood(str(tmp_path / "ilik.xml"), vs)
    exp = lik.model.experiments[0]
    # observed: first-component means
    obs = exp.observed_data(2)  # prolif at concentration index 1
    np.testing.assert_allclose(obs[:, 0], expected[:, 1, 0], rtol=1e-12)
    obs_a = exp.observed_data(3)  # apoptosis at concentration index 1
    np.testing.assert_allclose(obs_a[:, 0], expected[:, 1, 1], rtol=1e-12)
    # modeled: recomputed steady-state values
    mod = np.asarray(exp.modeled_data(jnp.asarray(tv), 2))
    np.testing.assert_allclose(mod, expected[:, 1, 0], rtol=1e-8)


# ---------------------------------------------------------------------------
# multiroot solves on a bistable feedback network
# (reference: SignalingNetwork.cpp:599-625 Sobol-seeded multiroot starts;
#  fISAExperimentSingleCondition.cpp:184-230,412-425 best-root selection)
# ---------------------------------------------------------------------------

BISTABLE_MODEL = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4"><model id="net">
<listOfSpecies>
{_species("s1", "A", "PROTEIN")}
{_species("s2", "B", "PROTEIN")}
</listOfSpecies>
<listOfReactions>
{_reaction("r1", "s1", "s2")}
{_reaction("r2", "s2", "s1")}
</listOfReactions>
</model></sbml>
"""


def _bistable_setup(tmp_path):
    """Mutually activating A <-> B under the fixed-k logistic limit:
    stable roots near (0.057, 0.057) and (0.982, 0.982), plus the
    unstable middle root. tv = [base_A, base_B, s_A_B, s_B_A]."""
    (tmp_path / "bnet.xml").write_text(BISTABLE_MODEL)
    vs = VariableSet()
    for name in ("base_A", "base_B", "strength_A_B", "strength_B_A"):
        vs.add_variable(name)
    tv = jnp.asarray([0.15, 0.15, 0.8, 0.8])
    return vs, tv


def test_multiroot_finds_both_roots(tmp_path):
    vs, tv = _bistable_setup(tmp_path)
    net = SignalingNetwork.from_sbml(
        str(tmp_path / "bnet.xml"), vs, "logistic"
    )
    assert net.has_feedback and net.multiroot_solves == 10
    preset = jnp.full((2,), jnp.nan)
    ones = jnp.ones((2,))
    # single fixed-0.5 start converges deterministically to one root
    single = np.asarray(net.calculate(tv, ones, preset))
    # multiroot: 10 Sobol-started solves covering the basins of both
    # stable roots
    acts = np.asarray(net.calculate_multiroot(tv, ones, preset))
    assert acts.shape == (10, 2)
    lows = acts[acts[:, 0] < 0.2]
    highs = acts[acts[:, 0] > 0.8]
    assert len(lows) > 0, f"no low root found: {acts[:, 0]}"
    assert len(highs) > 0, f"no high root found: {acts[:, 0]}"
    # each found root satisfies the fixed-point equations
    for a, b in np.concatenate([lows, highs]):
        np.testing.assert_allclose(
            a, _logistic_fixed(0.15 + 0.8 * b), atol=1e-4
        )
        np.testing.assert_allclose(
            b, _logistic_fixed(0.15 + 0.8 * a), atol=1e-4
        )
    # the single start lands on exactly one of them; the multiroot set
    # must contain a root the single start does NOT find
    others = acts[np.abs(acts[:, 0] - single[0]) > 0.3]
    assert len(others) > 0


def test_multiroot_best_root_scoring(tmp_path):
    """Data placed at the low root: the fixed-0.5 single-start solver
    provably lands on the worse (high/middle) root, while the multiroot
    likelihood recovers the reference's answer — the best-scoring root's
    logp and activities (fISAExperimentSingleCondition.cpp:412-425)."""
    import h5py

    vs, tv = _bistable_setup(tmp_path)
    net = SignalingNetwork.from_sbml(
        str(tmp_path / "bnet.xml"), vs, "logistic"
    )
    preset = jnp.full((2,), jnp.nan)
    ones = jnp.ones((2,))
    acts = np.asarray(net.calculate_multiroot(tv, ones, preset))
    low = acts[np.argmin(acts[:, 0])]
    assert low[0] < 0.2
    single = np.asarray(net.calculate(tv, ones, preset))
    assert single[0] > 0.3, "single start unexpectedly found the low root"

    with h5py.File(tmp_path / "bdata.nc", "w") as f:
        g = f.create_group("exp1")
        g.create_dataset("cell_lines", data=np.array(["c1"], dtype="S8"))
        g.create_dataset("a_data", data=np.array([[low[0]]]))
    (tmp_path / "blik.xml").write_text(
        '<bcm_likelihood type="fISA">\n'
        '<experiment name="exp1" model_file="bnet.xml" data_file="bdata.nc"'
        ' activation_limit="logistic">\n'
        '  <data species_name="A" data_name="a_data"\n'
        '    likelihood_function="normal" use_base="false" use_scale="false"\n'
        '    scale_var_with_mean="false" sd="0.02"/>\n'
        "</experiment>\n"
        "</bcm_likelihood>\n"
    )
    lik = create_likelihood(str(tmp_path / "blik.xml"), vs)
    exp = lik.model.experiments[0]

    lp_best = float(lik.log_prob(tv))
    # what the single-start solver would have scored (the wrong root)
    lp_single = float(exp._data_logp(jnp.asarray(single), ones, tv, 0))
    assert lp_best > lp_single + 100.0, (lp_best, lp_single)
    # the stored/accessor activities are the best root's
    stored = np.asarray(exp.modeled_activities(tv))
    np.testing.assert_allclose(stored[0], low, atol=1e-4)
    # jit + vmap over chains stays finite and consistent
    batch = jnp.stack([tv, tv * 0.98])
    out = np.asarray(jax.jit(jax.vmap(lik.log_prob))(batch))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], lp_best, rtol=1e-10)


def test_multiroot_solves_attribute(tmp_path):
    """multiroot_solves XML attribute (reference fISALikelihood.cpp:31)."""
    import h5py

    vs, tv = _bistable_setup(tmp_path)
    with h5py.File(tmp_path / "bdata.nc", "w") as f:
        g = f.create_group("exp1")
        g.create_dataset("cell_lines", data=np.array(["c1"], dtype="S8"))
        g.create_dataset("a_data", data=np.array([[0.05]]))
    (tmp_path / "blik.xml").write_text(
        '<bcm_likelihood type="fISA">\n'
        '<experiment name="exp1" model_file="bnet.xml" data_file="bdata.nc"'
        ' activation_limit="logistic" multiroot_solves="4">\n'
        '  <data species_name="A" data_name="a_data"\n'
        '    likelihood_function="normal" use_base="false" use_scale="false"\n'
        '    scale_var_with_mean="false" sd="0.02"/>\n'
        "</experiment>\n"
        "</bcm_likelihood>\n"
    )
    lik = create_likelihood(str(tmp_path / "blik.xml"), vs)
    exp = lik.model.experiments[0]
    assert exp.network.multiroot_solves == 4
    acts = exp.network.calculate_multiroot(
        tv, jnp.ones((2,)), jnp.full((2,), jnp.nan)
    )
    assert acts.shape == (4, 2)
