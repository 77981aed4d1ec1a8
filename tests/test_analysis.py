"""Analysis layer + bcmopt tests (reference: R/stats.r, src/bcmopt/)."""

import numpy as np
import pytest

from bcm3_tpu.analysis import (
    aic,
    effective_sample_size,
    log_posterior,
    marginal_likelihood,
    variable_summary,
)
from bcm3_tpu.io.output import SampleHandlerMAP, SampleHandlerTSV


def _fake_results(S=2000, C=4, D=3, seed=0):
    rng = np.random.default_rng(seed)
    samples = rng.normal(size=(S, C, D)) * np.array([1.0, 2.0, 0.5])
    temps = np.array([0.0, 0.1, 0.5, 1.0])
    llh = rng.normal(-100.0, 3.0, size=(S, C)) - 10 * (1 - temps)[None, :]
    lp = rng.normal(-5.0, 1.0, size=(S, C))
    return {
        "samples": samples,
        "log_prior": lp,
        "log_likelihood": llh,
        "weights": np.ones((S, C)),
        "temperatures": temps,
        "variables": [f"v{i}" for i in range(D)],
        "variable_transform": np.zeros(D, dtype=np.uint32),
    }


def test_variable_summary():
    res = _fake_results()
    s = variable_summary(res)
    np.testing.assert_allclose(s["mean"], 0.0, atol=0.15)
    np.testing.assert_allclose(s["sd"], [1.0, 2.0, 0.5], rtol=0.1)
    assert np.all(s["ess"] > 300)  # iid samples: ESS ~ n
    np.testing.assert_allclose(
        s["q025"] / s["sd"], -1.96, atol=0.25
    )


def test_ess_correlated_lower():
    rng = np.random.default_rng(1)
    n = 4000
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = 0.95 * x[i - 1] + rng.normal()
    ess = effective_sample_size(x)
    # AR(1) rho=0.95: ESS/n ~ (1-rho)/(1+rho) ~ 0.026
    assert ess < 0.1 * n
    assert ess > 0.005 * n


def test_log_posterior_and_aic():
    res = _fake_results()
    lpost = log_posterior(res)
    np.testing.assert_allclose(
        lpost[:, 0], res["log_prior"][:, 0]
    )  # T=0: prior only
    a = aic(res)
    ll = res["log_likelihood"][1000:, -1]
    np.testing.assert_allclose(a, 2 * 3 - 2 * ll.max())


def test_marginal_likelihood_trapz():
    res = _fake_results()
    ml = marginal_likelihood(res)
    mean_ll = res["log_likelihood"][1000:, :].mean(axis=0)
    expect = np.trapezoid(mean_ll, res["temperatures"])
    np.testing.assert_allclose(ml, expect, rtol=1e-12)
    # infinite T=0 chain mean drops the first rung
    res["log_likelihood"][:, 0] = -np.inf
    ml2 = marginal_likelihood(res)
    expect2 = np.trapezoid(
        res["log_likelihood"][1000:, 1:].mean(axis=0), res["temperatures"][1:]
    )
    np.testing.assert_allclose(ml2, expect2, rtol=1e-12)


def test_map_handler_and_tsv(tmp_path):
    m = SampleHandlerMAP()
    xs = np.zeros((3, 2, 2))
    xs[1, -1] = [5.0, 6.0]
    lp = np.array([[0.0, -3.0], [0.0, -1.0], [0.0, -2.0]])
    ll = np.array([[0.0, -10.0], [0.0, -5.0], [0.0, -8.0]])
    m.receive_samples(xs, lp, ll, np.array([0.0, 1.0]))
    assert m.map_lposterior == -6.0
    assert m.map_llikelihood == -5.0
    np.testing.assert_allclose(m.map_sample, [5.0, 6.0])

    t = SampleHandlerTSV(str(tmp_path / "out.tsv"), ["a", "b"])
    t.receive_samples(xs, lp, ll, np.array([0.0, 1.0]))
    t.close()
    lines = (tmp_path / "out.tsv").read_text().strip().split("\n")
    assert lines[0] == "log_prior\tlog_likelihood\ta\tb"
    assert len(lines) == 4
    assert lines[2].split("\t")[2] == "5"


def test_bcmopt_cli(tmp_path):
    """bcmopt over a banana run with one extra stored (non-sampled)
    variable."""
    import subprocess
    import sys

    import h5py

    # build a fake output.nc with 3 variables: x0, x1 (sampled) + extra
    S, C = 40, 2
    rng = np.random.default_rng(3)
    with h5py.File(tmp_path / "output.nc", "w") as f:
        g = f.create_group("samples")
        g.create_dataset("sample_ix", data=np.arange(1, S + 1, dtype=np.uint32))
        g.create_dataset(
            "variable", data=np.array(["x0", "x1", "extra"], dtype="S8")
        )
        g.create_dataset("temperature", data=np.array([0.0, 1.0]))
        g.create_dataset(
            "variable_transform", data=np.zeros(3, dtype=np.uint32)
        )
        vv = rng.normal(size=(S, C, 3))
        g.create_dataset("variable_values", data=vv)
        g.create_dataset("log_prior", data=rng.normal(size=(S, C)))
        g.create_dataset("log_likelihood", data=rng.normal(size=(S, C)))
        g.create_dataset("weights", data=np.ones((S, C)))

    (tmp_path / "prior.xml").write_text(
        "<prior>\n"
        '<variable name="x0" distribution="uniform" lower="-5" upper="5"/>\n'
        '<variable name="x1" distribution="uniform" lower="-5" upper="15"/>\n'
        "</prior>\n"
    )
    # likelihood over the full 3-variable layout: banana needs exactly 2,
    # so use a python plugin summing a quadratic over all three
    (tmp_path / "lik.py").write_text(
        "import jax.numpy as jnp\n"
        "def make_log_prob(names):\n"
        "    def log_prob(v):\n"
        "        return -0.5 * jnp.sum((v - 1.0) ** 2)\n"
        "    return log_prob\n"
    )
    (tmp_path / "likelihood.xml").write_text(
        f'<bcm_likelihood type="dll" dll_filename_base="{tmp_path}/lik"/>\n'
    )
    cmd = [
        sys.executable, "-m", "bcm3_tpu.cli",
        "--bcmopt",
        "--prior", str(tmp_path / "prior.xml"),
        "--likelihood", str(tmp_path / "likelihood.xml"),
        "--output.folder", str(tmp_path),
        "--bcmopt.num_samples", "2",
        "--sampler.num_samples", "60",
        "--ptmhsampler.num_chains", "2",
        "--sampler.rngseed", "5",
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    t1 = (tmp_path / "MAP_estimates.tsv").read_text().strip().split("\n")
    assert len(t1) == 3  # header + 2 temperatures
    t2 = (tmp_path / "MAP_estimates_paramvalues.tsv").read_text().strip().split("\n")
    assert t2[0].startswith("temperature_sample")
    assert "fixed_extra" in t2[0]
    assert "optimized_x0" in t2[0]
    assert len(t2) == 1 + 2 * 2
    # the optimized x0/x1 should approach 1.0 (the quadratic optimum)
    last = t2[-1].split("\t")
    x0 = float(last[-2])
    assert abs(x0 - 1.0) < 0.8


def test_effective_sample_size_batched_matches_loop():
    from bcm3_tpu.analysis import (
        effective_sample_size,
        effective_sample_size_batched,
    )

    rng = np.random.default_rng(0)
    n, B = 300, 5
    x = np.zeros((n, B))
    for b, r in enumerate([0.0, 0.4, 0.8, 0.95, -0.3]):
        for i in range(1, n):
            x[i, b] = r * x[i - 1, b] + rng.normal()
    batched = effective_sample_size_batched(x)
    loop = np.array([effective_sample_size(x[:, b]) for b in range(B)])
    np.testing.assert_allclose(batched, loop, rtol=1e-12)
    # constant column falls back to n
    const = effective_sample_size_batched(np.ones((50, 1)))
    assert const[0] == 50.0
