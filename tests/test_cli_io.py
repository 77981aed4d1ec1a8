"""CLI + output-file tests: config.txt in, R-schema output.nc out."""

import os
import shutil

import h5py
import numpy as np
import pytest

from bcm3_tpu.io.config import load_options, pt_config_from_options
from bcm3_tpu.io.output import NC_FILL_DOUBLE, load_results

REF = "/root/reference/examples"


def test_load_reference_config():
    opts = load_options(os.path.join(REF, "banana", "config.txt"))
    cfg = pt_config_from_options(opts)
    assert cfg.num_samples == 8000
    assert cfg.use_every_nth == 5
    assert cfg.num_chains == 6
    assert cfg.swapping_scheme == "deterministic_even_odd"
    assert cfg.adapt_proposal_times == 1
    assert cfg.adapt_proposal_samples == 2000
    assert cfg.temperature_schedule_power == 3.0
    assert cfg.output_proposal_adaptation is True
    assert opts["output.folder"] == "output_t6_n5_e1"


def test_cli_run_and_predict(tmp_path):
    from bcm3_tpu import cli

    # small run off the reference banana example
    cfg_file = tmp_path / "config.txt"
    cfg_file.write_text(
        f"""[sampler]
num_samples=60
use_every_nth=2
rngseed=77

[ptmhsampler]
num_chains=4
adapt_proposal_samples=30
adapt_proposal_times=1
output_proposal_adaptation=true

[output]
folder={tmp_path}/out
"""
    )
    rc = cli.main(
        [
            "-c",
            str(cfg_file),
            "--prior",
            os.path.join(REF, "banana", "prior.xml"),
            "--likelihood",
            os.path.join(REF, "banana", "likelihood.xml"),
        ]
    )
    assert rc == 0

    out_nc = tmp_path / "out" / "output.nc"
    assert out_nc.exists()

    # schema check: exactly what R/load.r reads
    with h5py.File(out_nc, "r") as f:
        g = f["samples"]
        assert g["variable_values"].shape == (60, 4, 2)
        assert g["log_prior"].shape == (60, 4)
        assert g["log_likelihood"].shape == (60, 4)
        assert g["weights"].shape == (60, 4)
        assert list(g["temperature"][:]) == sorted(g["temperature"][:])
        names = [v.decode() for v in g["variable"][:]]
        assert names == ["x1", "x2"]
        assert g["variable_values"].fillvalue == NC_FILL_DOUBLE
        # fully written: no fill values left
        assert not np.any(g["variable_values"][:] == NC_FILL_DOUBLE)

    res = load_results(str(out_nc))
    assert np.isfinite(res["samples"]).all()
    # power posterior identity: lposterior = lprior + llh finite at T=1
    assert np.isfinite(res["log_prior"][:, -1] + res["log_likelihood"][:, -1]).all()

    # adaptation dump exists with the R-consumed layout
    adapt_nc = tmp_path / "out" / "sampler_adaptation.nc"
    assert adapt_nc.exists()
    with h5py.File(adapt_nc, "r") as f:
        assert "adapt0" in f and "adapt1" in f
        b1 = f["adapt1"]["block1"]
        assert "gmm_weights" in b1 and "variable_indices" in b1
        assert "cluster0_mean" in b1 and "cluster0_covariance" in b1
        assert "history" in b1

    # predict mode over the stored samples
    rc = cli.main(
        [
            "-c",
            str(cfg_file),
            "--prior",
            os.path.join(REF, "banana", "prior.xml"),
            "--likelihood",
            os.path.join(REF, "banana", "likelihood.xml"),
            "--predict",
        ]
    )
    assert rc == 0
    pred_nc = tmp_path / "out" / "prediction.nc"
    with h5py.File(pred_nc, "r") as f:
        pred = f["predictions"]["log_likelihood"][:]
        assert pred.shape == (60, 4)
        # second half evaluated, first half left as fill
        assert np.all(pred[:30] == NC_FILL_DOUBLE)
        evaluated = pred[30:, -1]
        assert np.all(evaluated != NC_FILL_DOUBLE)
    # predictions must equal the stored log-likelihoods at T=1
    np.testing.assert_allclose(
        evaluated, res["log_likelihood"][30:, -1], rtol=1e-9
    )


def test_cli_reduced_precision_emission(tmp_path):
    """ptmhsampler.emit_dtype=bfloat16 (the host-link bandwidth option,
    BASELINE.md emission-dtype table) must flow from config.txt through
    the sampler to an R-loadable float64 output.nc — h5py has no native
    conversion from ml_dtypes arrays, so the handlers cast."""
    import jax.numpy as jnp

    from bcm3_tpu import cli
    from bcm3_tpu.io.config import load_options, pt_config_from_options

    cfg_file = tmp_path / "config.txt"
    cfg_file.write_text(
        f"""[sampler]
num_samples=20
use_every_nth=2
rngseed=5

[ptmhsampler]
num_chains=4
proposal_type=global_covariance
adapt_proposal_samples=0
adapt_proposal_times=0
emit_dtype=bfloat16
emit_fixed_only=true

[output]
folder={tmp_path}/out
"""
    )
    cfg = pt_config_from_options(load_options(str(cfg_file)))
    assert cfg.emit_dtype == jnp.bfloat16
    assert cfg.emit_fixed_only is True

    rc = cli.main(
        [
            "-c",
            str(cfg_file),
            "--prior",
            os.path.join(REF, "banana", "prior.xml"),
            "--likelihood",
            os.path.join(REF, "banana", "likelihood.xml"),
        ]
    )
    assert rc == 0
    res = load_results(str(tmp_path / "out" / "output.nc"))
    s = np.asarray(res["samples"])
    assert s.shape == (20, 1, 2)
    assert s.dtype == np.float64
    assert np.isfinite(s).all()


def test_data_reference(tmp_path):
    """Generic NetCDF data-value resolver (reference:
    src/sampler/DataReference.cpp — an orphaned utility there, provided
    for interface completeness): named dimensions in any order, index
    labels resolved against dimension coordinate values."""
    import h5py

    from bcm3_tpu.io.data_reference import data_reference

    fn = str(tmp_path / "ref.nc")
    with h5py.File(fn, "w") as f:
        g = f.create_group("grp")
        pat = g.create_dataset(
            "patient", data=np.array([b"p1", b"p2", b"p3"])
        )
        tm = g.create_dataset("time", data=np.array([0.0, 1.5, 3.0, 4.5]))
        v = g.create_dataset("conc", data=np.arange(12.0).reshape(3, 4))
        pat.make_scale("patient")
        tm.make_scale("time")
        v.dims[0].attach_scale(pat)
        v.dims[1].attach_scale(tm)

    got = data_reference(fn, "grp", "conc", ["patient", "time"], ["p2", "3.0"])
    assert got == 6.0
    # dimension order in the reference spec may differ from the variable's
    got = data_reference(fn, "grp", "conc", ["time", "patient"], ["1.5", "p3"])
    assert got == 9.0

    with pytest.raises(ValueError):
        data_reference(fn, "grp", "conc", ["patient"], ["p2"])
    with pytest.raises(KeyError):
        data_reference(fn, "grp", "conc", ["patient", "time"], ["p9", "3.0"])


def test_cli_sample_history_clustering_dump(tmp_path):
    """ptmhsampler.output_sample_clustering=true writes the reference's
    per-adaptation spectral-clustering diagnostic file
    sample_history_clustering.nc (SampleHistoryClustering.cpp:40-56),
    loadable through the R-contract bundler loader (R/load.r:137-168)."""
    from bcm3_tpu import cli
    from bcm3_tpu.io.hdf5r_compat import load_netcdf_bundler_data

    cfg_file = tmp_path / "config.txt"
    cfg_file.write_text(
        f"""[sampler]
num_samples=60
use_every_nth=2
rngseed=77

[ptmhsampler]
num_chains=4
proposal_type=clustered_covariance
adapt_proposal_samples=30
adapt_proposal_times=1
sample_clustering_num_clusters=2
output_sample_clustering=true

[output]
folder={tmp_path}/out
"""
    )
    rc = cli.main(
        [
            "-c",
            str(cfg_file),
            "--prior",
            os.path.join(REF, "banana", "prior.xml"),
            "--likelihood",
            os.path.join(REF, "banana", "likelihood.xml"),
        ]
    )
    assert rc == 0
    fn = tmp_path / "out" / "sample_history_clustering.nc"
    assert fn.exists()
    bundle = load_netcdf_bundler_data(str(fn))
    assert "iter0" in bundle
    it = bundle["iter0"]
    for name in (
        "clustering_input_samples",
        "clustering_input_sample_scaling",
        "K",
        "Y",
        "assignment",
        "all_assignment",
    ):
        assert name in it, f"missing {name}"
    # shape consistency (hdf5r loader presents matrices transposed):
    # n unique samples x D variables; K is n x n; Y is n x k
    n = it["K"].shape[0]
    assert it["K"].shape == (n, n)
    assert set(it["clustering_input_samples"].shape) >= {n} or (
        n in it["clustering_input_samples"].shape
    )
    assert len(it["clustering_input_sample_scaling"]) == 2  # banana D=2
    assert it["Y"].shape[0] == n or it["Y"].shape[1] == n
    assert len(it["assignment"]) == n
    k = int(np.max(it["assignment"])) + 1
    assert k <= 2
    # every unique sample's assignment is a valid cluster index
    assert np.all((it["assignment"] >= 0) & (it["assignment"] < 2))
    assert np.all((it["all_assignment"] >= 0) & (it["all_assignment"] < 2))
    # the full-history assignment covers at least the unique samples
    assert len(it["all_assignment"]) >= n
