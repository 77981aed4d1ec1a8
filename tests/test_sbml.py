"""SBML parser + JAX RHS codegen tests
(reference: src/sbml/SBMLModel.cpp, SBMLRatelaws.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from bcm3_tpu.sbml import SBMLModel, parse_sbml_string
from bcm3_tpu.sbml.ratelaws import hill, michaelis_menten, safepow, synthcap, tqssa

SBML_NS = "http://www.sbml.org/sbml/level2/version4"
MATHML = "http://www.w3.org/1998/Math/MathML"

# A small CellDesigner-flavoured model:
#   synthesis:  -> A       rate k_syn
#   conversion: A -> B     rate mm(kcat, KM, E, A)   (E constant species)
#   degradation: B -> sink rate k_deg * B
MODEL = f"""<?xml version="1.0" encoding="UTF-8"?>
<sbml xmlns="{SBML_NS}" xmlns:celldesigner="http://www.sbml.org/2001/ns/celldesigner" level="2" version="4">
<model id="m1">
<listOfSpecies>
  <species id="sA" name="A" initialAmount="2.0">
    <annotation><celldesigner:extension>
      <celldesigner:speciesIdentity>
        <celldesigner:class>PROTEIN</celldesigner:class>
        <celldesigner:proteinReference>pr1</celldesigner:proteinReference>
      </celldesigner:speciesIdentity>
    </celldesigner:extension></annotation>
  </species>
  <species id="sB" name="B" initialAmount="0.5"/>
  <species id="sE" name="E" initialAmount="1.5"/>
  <species id="sSink" name="deg" initialAmount="0">
    <annotation><celldesigner:extension>
      <celldesigner:speciesIdentity>
        <celldesigner:class>DEGRADED</celldesigner:class>
      </celldesigner:speciesIdentity>
    </celldesigner:extension></annotation>
  </species>
</listOfSpecies>
<listOfParameters>
  <parameter id="KM" value="0.7"/>
</listOfParameters>
<listOfReactions>
  <reaction id="r_syn">
    <listOfProducts><speciesReference species="sA"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}">
      <ci>k_syn</ci>
    </math></kineticLaw>
  </reaction>
  <reaction id="r_conv">
    <listOfReactants><speciesReference species="sA"/></listOfReactants>
    <listOfProducts><speciesReference species="sB"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}">
      <apply><ci>mm</ci><ci>kcat</ci><ci>KM</ci><ci>sE</ci><ci>sA</ci></apply>
    </math></kineticLaw>
  </reaction>
  <reaction id="r_deg">
    <listOfReactants><speciesReference species="sB"/></listOfReactants>
    <listOfProducts><speciesReference species="sSink"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}">
      <apply><times/><ci>k_deg</ci><ci>sB</ci></apply>
    </math></kineticLaw>
  </reaction>
</listOfReactions>
</model>
</sbml>
"""


def test_parse_and_classify():
    m = SBMLModel.from_string(MODEL)
    # sink excluded; E constant (no reactions touch it); A, B integrated
    assert m.ode_species == ["sA", "sB"]
    assert m.constant_species == ["sE"]
    assert m.simulated_species == ["sA", "sB", "sE"]
    assert m.doc.species["sA"].sbml_type == "Protein"
    assert m.species_full_name("sA") == "A_protein"
    assert m.species_full_name("sSink") == "sink"
    assert set(m.get_parameter_names()) == {"KM", "k_syn", "kcat", "k_deg"}
    np.testing.assert_allclose(m.initial_ode_values(), [2.0, 0.5])
    np.testing.assert_allclose(m.initial_constant_values(), [1.5])


def test_rhs_matches_hand_computation():
    m = SBMLModel.from_string(MODEL)
    rhs = m.make_rhs(["k_syn", "kcat", "k_deg"])
    y = jnp.asarray([2.0, 0.5])
    c = jnp.asarray([1.5])
    p = jnp.asarray([0.3, 1.2, 0.4])
    dy = np.asarray(rhs(0.0, y, c, p, jnp.zeros(0)))
    # hand computation: KM resolves to the SBML document value 0.7
    conv = 1.2 * 1.5 * 2.0 / (0.7 + 2.0)
    np.testing.assert_allclose(dy, [0.3 - conv, conv - 0.4 * 0.5], rtol=1e-12)


def test_rhs_jit_grad_vmap():
    m = SBMLModel.from_string(MODEL)
    rhs = m.make_rhs(["k_syn", "kcat", "k_deg"])
    c = jnp.asarray([1.5])
    nsp = jnp.zeros(0)
    f = jax.jit(lambda y, p: rhs(0.0, y, c, p, nsp))
    ys = jnp.asarray(np.random.default_rng(0).uniform(0.1, 2, (16, 2)))
    p = jnp.asarray([0.3, 1.2, 0.4])
    out = jax.vmap(lambda y: f(y, p))(ys)
    assert out.shape == (16, 2)
    jac = m.make_jacobian(rhs)
    J = np.asarray(jac(0.0, jnp.asarray([2.0, 0.5]), c, p, nsp))
    # dB'/dB = -k_deg
    np.testing.assert_allclose(J[1, 1], -0.4, rtol=1e-12)
    # dA'/dA = -d(mm)/dA = -kcat*E*KM/(KM+A)^2
    np.testing.assert_allclose(
        J[0, 0], -1.2 * 1.5 * 0.7 / (0.7 + 2.0) ** 2, rtol=1e-10
    )


def test_special_functions():
    np.testing.assert_allclose(float(hill(2.0, 1.0, 3.0)), 8 / 9)
    assert float(michaelis_menten(1.0, 0.5, -1.0, 2.0)) == 0.0
    np.testing.assert_allclose(
        float(michaelis_menten(2.0, 0.5, 1.0, -0.3)), 2 * 1 * -0.3 / 0.5
    )
    assert float(synthcap(-0.5)) == 0.0
    np.testing.assert_allclose(float(synthcap(0.5)), 1 - 0.5**8)
    np.testing.assert_allclose(float(tqssa(1.0, 0.5, 1.0, 2.0)),
                               0.5 * (3.5 - np.sqrt(3.5**2 - 8)))
    assert float(safepow(-2.0, 0.5)) == 0.0
    # gradient of safepow must not produce NaN at negative base
    g = jax.grad(lambda x: safepow(x, 2.0))(-1.0)
    assert np.isfinite(float(g))


def test_assignment_rules_and_functions():
    model = f"""<?xml version="1.0"?>
<sbml xmlns="{SBML_NS}" level="2" version="4">
<model id="m2">
<listOfFunctionDefinitions>
  <functionDefinition id="double_it">
    <math xmlns="{MATHML}"><lambda>
      <bvar><ci>x</ci></bvar>
      <apply><times/><cn>2</cn><ci>x</ci></apply>
    </lambda></math>
  </functionDefinition>
</listOfFunctionDefinitions>
<listOfSpecies>
  <species id="u" name="u" initialAmount="1.0"/>
  <species id="v" name="v" initialAmount="0.0"/>
  <species id="w" name="w" initialAmount="0.0"/>
</listOfSpecies>
<listOfReactions>
  <reaction id="r1">
    <listOfReactants><speciesReference species="u"/></listOfReactants>
    <listOfProducts><speciesReference species="v" stoichiometry="2"/></listOfProducts>
    <kineticLaw><math xmlns="{MATHML}">
      <apply><ci>double_it</ci><apply><times/><ci>k</ci><ci>u</ci></apply></apply>
    </math></kineticLaw>
  </reaction>
</listOfReactions>
<listOfRules>
  <assignmentRule variable="w">
    <math xmlns="{MATHML}"><apply><plus/><ci>u</ci><ci>v</ci></apply></math>
  </assignmentRule>
</listOfRules>
</model>
</sbml>"""
    m = SBMLModel.from_string(model)
    # w has no reactions but an assignment rule; it's classified constant
    # in the reference scheme and overwritten by the rule in assignments
    rhs = m.make_rhs(["k"])
    y = jnp.asarray([1.5, 0.25])
    p = jnp.asarray([0.5])
    dy = np.asarray(rhs(0.0, y, jnp.asarray([0.0]), p, jnp.zeros(0)))
    rate = 2 * 0.5 * 1.5
    np.testing.assert_allclose(dy, [-rate, 2 * rate], rtol=1e-12)
    assigned = m.make_assignments(["k"])
    out = np.asarray(assigned(0.0, y, jnp.asarray([0.0]), p, jnp.zeros(0)))
    np.testing.assert_allclose(out, [1.5, 0.25, 1.75], rtol=1e-12)
