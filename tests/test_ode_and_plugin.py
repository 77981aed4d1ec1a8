"""ODE template + plugin likelihood tests
(reference: src/likelihoods/LikelihoodODE.cpp, LikelihoodDLL.cpp)."""

import subprocess
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.variables import VariableSet


def _varset_13():
    vs = VariableSet()
    for i in range(13):
        vs.add_variable(f"p{i}")
    return vs


def test_ode_template_default_stub():
    """With the reference's empty derivative stub, trajectories are
    constant at the initial conditions."""
    vs = _varset_13()
    lik = create_likelihood("ODE", vs)
    values = jnp.asarray(np.linspace(0.1, 1.3, 13))
    ys, ok = lik.model.simulate(values)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(ys), np.tile(values[9:13], (100, 1)), atol=1e-6)
    lp = lik.log_prob(values)
    # closed form: sum of t(nu=3, sd=10) densities of the cosine data
    # against the constant y0[0]
    from bcm3_tpu.distributions.univariate import logpdf_t

    ts = np.linspace(0, 1000, 100)
    data = 100 * np.cos(ts / 2300.0) + 300.0
    expect = np.asarray(logpdf_t(jnp.asarray(data), values[9], 10.0, 3.0)).sum()
    np.testing.assert_allclose(float(lp), expect, rtol=1e-10)


def test_ode_template_custom_derivative():
    """A harmonic oscillator tuned to the data curve should beat the stub."""
    vs = _varset_13()

    def deriv(t, y, p):
        # y0' = y1, y1' = -w^2 y0 with w = 1/2300, plus two inert states
        w = 1.0 / 2300.0
        return jnp.array([y[1], -w * w * y[0], 0.0, 0.0], dtype=y.dtype)

    lik = create_likelihood("ODE", vs, _derivative=deriv)
    vals = np.zeros(13)
    vals[9] = 100.0  # y0 amplitude; data = 100 cos(wt) + 300 -> centered osc
    values = jnp.asarray(vals)
    ys, ok = lik.model.simulate(values)
    assert bool(ok)
    ts = np.linspace(0, 1000, 100)
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0], 100 * np.cos(ts / 2300.0), rtol=1e-4, atol=1e-3
    )


def test_python_plugin(tmp_path):
    plugin = tmp_path / "mylik.py"
    plugin.write_text(
        textwrap.dedent(
            """
            import jax.numpy as jnp

            def make_log_prob(variable_names):
                def log_prob(values):
                    return -0.5 * jnp.sum(values**2)
                return log_prob
            """
        )
    )
    vs = VariableSet()
    vs.add_variable("a")
    vs.add_variable("b")
    lik = create_likelihood("dll", vs, dll_filename_base=str(plugin)[:-3])
    x = jnp.asarray([1.0, 2.0])
    assert np.isclose(float(lik.log_prob(x)), -2.5)
    # must be vmappable/jittable
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))
    out = jax.jit(jax.vmap(lik.log_prob))(xs)
    np.testing.assert_allclose(np.asarray(out), -0.5 * (np.asarray(xs) ** 2).sum(1))


def test_python_plugin_host_callback(tmp_path):
    plugin = tmp_path / "hostlik.py"
    plugin.write_text(
        "def evaluate_log_probability(values):\n"
        "    return float(-(values**2).sum())\n"
    )
    vs = VariableSet()
    vs.add_variable("a")
    lik = create_likelihood("dll", vs, dll_filename_base=str(plugin)[:-3])
    out = jax.jit(jax.vmap(lik.log_prob))(jnp.asarray([[1.0], [2.0]]))
    np.testing.assert_allclose(np.asarray(out), [-1.0, -4.0])


def test_c_plugin(tmp_path):
    """Compile the reference's null-likelihood C ABI and load it via ctypes
    (reference: examples/dll_likelihood/code.cpp:8-13)."""
    src = tmp_path / "code.c"
    src.write_text(
        textwrap.dedent(
            """
            #include <stddef.h>
            #include <math.h>
            int initialize_likelihood(size_t n, const char* const* names)
            { return 1; }
            int evaluate_log_probability(ptrdiff_t n, const double* values,
                                         const char** names, double* log_p)
            {
                double s = 0.0;
                for (ptrdiff_t i = 0; i < n; i++) s += values[i] * values[i];
                *log_p = -0.5 * s;
                return 1;
            }
            """
        )
    )
    so = tmp_path / "mylik.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-o", str(so), str(src)], check=True
    )
    vs = VariableSet()
    vs.add_variable("a")
    vs.add_variable("b")
    lik = create_likelihood("dll", vs, dll_filename_base=str(so)[:-3])
    out = jax.jit(jax.vmap(lik.log_prob))(jnp.asarray([[1.0, 2.0], [0.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(out), [-2.5, -4.5])
