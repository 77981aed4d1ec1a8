"""Plot-layer tests (reference: R/plots_functions.r).

Rendering goes through the Agg backend; numeric assertions cover the
weighted reflected KDE and the ellipse geometry, and each public plot
function is exercised end-to-end to a PNG file.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from bcm3_tpu import plots
from bcm3_tpu.io.bundler import load_bundle, write_adaptation_dump
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet


def _uniform_prior(tmp_path, lo=0.0, hi=1.0):
    p = tmp_path / "prior.xml"
    p.write_text(
        "<prior>"
        f'<variable name="a" distribution="uniform" lower="{lo}" upper="{hi}"/>'
        f'<variable name="b" distribution="uniform" lower="{lo}" upper="{hi}"/>'
        "</prior>"
    )
    return Prior.from_xml(str(p))


def _results(rng, S=400, T=2, D=2):
    samples = rng.uniform(0.2, 0.8, size=(S, T, D))
    return {
        "samples": samples,
        "weights": np.ones(S),
        "log_prior": np.zeros((S, T)),
        "log_likelihood": np.zeros((S, T)),
        "variables": ["a", "b"][:D],
        "variable_transform": np.zeros(D, dtype=np.int32),
    }


def test_weighted_kde_integrates_to_one():
    rng = np.random.default_rng(0)
    s = rng.beta(2.0, 5.0, size=2000)
    w = np.ones_like(s)
    grid = np.linspace(0, 1, 1001)
    dens = plots.weighted_kde(s, w, grid, lbound=0.0, ubound=1.0)
    mass = np.trapezoid(dens, grid)
    np.testing.assert_allclose(mass, 1.0, atol=0.02)
    # density tracks the true Beta(2,5) shape away from the boundary
    # (reflection makes the KDE flat at a bound, like the reference's)
    from scipy import stats

    interior = (grid > 0.05) & (grid < 0.95)
    true = stats.beta.pdf(grid, 2, 5)
    assert np.max(np.abs(dens - true)[interior]) < 0.45


def test_weighted_kde_respects_weights():
    """All weight on a point mass -> density concentrates there."""
    s = np.array([0.2] * 50 + [0.8] * 50)
    w = np.array([1.0] * 50 + [1e-12] * 50)
    grid = np.linspace(0, 1, 101)
    dens = plots.weighted_kde(s, w, grid)
    assert dens[np.argmin(np.abs(grid - 0.2))] > 10 * dens[
        np.argmin(np.abs(grid - 0.8))
    ]


def test_cov_ellipse_geometry():
    """Ellipse points lie at constant Mahalanobis radius chi2_2(level)."""
    from scipy import stats

    mean = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.6], [0.6, 0.5]])
    pts = plots._cov_ellipse(mean, cov, level=0.6)
    d = pts - mean
    m = np.einsum("ni,ij,nj->n", d, np.linalg.inv(cov), d)
    np.testing.assert_allclose(m, stats.chi2.ppf(0.6, 2), rtol=1e-4)


def test_marginal_density_and_trace(tmp_path):
    rng = np.random.default_rng(1)
    prior = _uniform_prior(tmp_path)
    res = _results(rng)
    ax = plots.marginal_density(res, prior, 0)
    # posterior curve drawn over [0,1]
    assert ax.get_title() == "a"
    ax2 = plots.trace_plot(res, 1)
    assert ax2.get_title() == "b"
    import matplotlib.pyplot as plt

    plt.close("all")


def test_tiled_outputs(tmp_path):
    rng = np.random.default_rng(2)
    prior = _uniform_prior(tmp_path)
    res = _results(rng)
    f1 = plots.plot_all_traces(res, str(tmp_path / "traces.png"))
    f2 = plots.plot_all_densities(res, prior, str(tmp_path / "dens.png"))
    assert (tmp_path / "traces.png").stat().st_size > 0
    assert (tmp_path / "dens.png").stat().st_size > 0


def test_bivariate_density(tmp_path):
    rng = np.random.default_rng(3)
    prior = _uniform_prior(tmp_path)
    res = _results(rng, S=300)
    ax = plots.bivariate_density(res, prior, 0, 1, gridsize=10)
    assert ax.get_xlabel() == "a"
    import matplotlib.pyplot as plt

    plt.close("all")


@pytest.mark.parametrize(
    "error_model", ["normal", "truncated_normal", "t", "truncated_t"]
)
def test_ppd_barplot_error_models(error_model):
    rng = np.random.default_rng(4)
    vs = rng.normal(0.5, 0.05, size=(100, 3))
    data = np.array([0.45, 0.52, 0.55])
    ax = plots.ppd_barplot(
        vs, data, ["c1", "c2", "c3"], sd_samples=0.1, error_model=error_model
    )
    import matplotlib.pyplot as plt

    plt.close("all")


def test_ppd_barplot_truncated_draws_within_bounds():
    rng = np.random.default_rng(5)
    draws = plots._predictive_draws(
        rng, np.full(200, 0.5), 0.3, "truncated_t", 10
    )
    assert draws.min() >= 0.0 and draws.max() <= 1.0
    draws_n = plots._predictive_draws(
        rng, np.full(200, 0.5), 0.3, "truncated_normal", 10
    )
    assert draws_n.min() >= 0.0 and draws_n.max() <= 1.0


def test_ppd_lineplot():
    rng = np.random.default_rng(6)
    x = np.linspace(0, 10, 25)
    traj = np.sin(x)[None, :] + rng.normal(0, 0.1, size=(80, 25))
    ax = plots.ppd_lineplot(x, np.sin(x), x, traj)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_adaptation_ellipse_plot(tmp_path):
    rng = np.random.default_rng(7)

    class StubGMM:
        num_components = 2
        weights = np.array([0.6, 0.4])
        means = np.array([[0.3, 0.3], [0.7, 0.7]])
        covariances = np.array(
            [np.diag([0.01, 0.02]), [[0.02, 0.005], [0.005, 0.01]]]
        )

    fn = str(tmp_path / "sampler_adaptation.nc")
    write_adaptation_dump(fn, 1, [(np.array([0, 1]), StubGMM())])
    bundle = load_bundle(fn)
    assert "adapt1" in bundle and "block1" in bundle["adapt1"]

    res = _results(rng)
    ax = plots.adaptation_ellipse_plot(res, bundle, "adapt1", "block1", 0, 1)
    import matplotlib.pyplot as plt

    plt.close("all")

    # variables outside the block raise
    class StubGMM1(StubGMM):
        means = np.array([[0.3], [0.7]])
        covariances = np.array([[[0.01]], [[0.02]]])

    fn2 = str(tmp_path / "adapt_single.nc")
    write_adaptation_dump(fn2, 1, [(np.array([0]), StubGMM1())])
    bundle2 = load_bundle(fn2)
    with pytest.raises(ValueError):
        plots.adaptation_ellipse_plot(res, bundle2, "adapt1", "block1", 0, 1)
