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


def test_feedback_component(tmp_path):
    """A -| B -> A feedback loop must converge via Newton iteration."""
    model = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4"><model id="net">
<listOfSpecies>
{_species("s1", "A", "PROTEIN")}
{_species("s2", "B", "PROTEIN")}
</listOfSpecies>
<listOfReactions>
{_reaction("r1", "s1", "s2")}
{_reaction("r2", "s2", "s1", positive=False)}
</listOfReactions>
</model></sbml>"""
    p = tmp_path / "fb.xml"
    p.write_text(model)
    vs = VariableSet()
    vs.add_variable("base_A")
    vs.add_variable("strength_A_B")
    vs.add_variable("strength_B_A")
    net = SignalingNetwork.from_sbml(str(p), vs, "minmax")
    tv = jnp.asarray([0.8, 0.9, 0.5])
    act = np.asarray(
        net.calculate(tv, jnp.ones((2,)), jnp.full((2,), jnp.nan))
    )
    # fixed point: a = clip(0.8 - 0.5 b), b = clip(0.9 a)
    a, b = act
    np.testing.assert_allclose(a, np.clip(0.8 - 0.5 * b, 0, 1), atol=1e-6)
    np.testing.assert_allclose(b, np.clip(0.9 * a, 0, 1), atol=1e-6)


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
