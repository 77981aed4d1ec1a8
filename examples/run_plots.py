"""Diagnostic-plot workflow: the python equivalent of the reference's
per-example plots.r scripts (reference: examples/banana/plots.r).

Runs the banana example with a proposal adaptation dump, writes
output.nc + sampler_adaptation.nc, then renders every diagnostic figure:
traces, marginal densities with prior overlays, the bivariate posterior
heatmap, and the adapted GMM components as covariance ellipses over the
samples.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from bcm3_tpu import plots
    from bcm3_tpu.io.bundler import load_bundle, write_adaptation_dump
    from bcm3_tpu.io.output import SampleHandlerHDF5, load_results
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    out = os.path.join(tempfile.mkdtemp(prefix="banana_plots_"), "out")
    os.makedirs(out)
    d = os.path.dirname(out)
    with open(os.path.join(d, "prior.xml"), "w") as f:
        f.write(
            "<prior>"
            '<variable name="x1" distribution="uniform" lower="-5" upper="5"/>'
            '<variable name="x2" distribution="uniform" lower="-5" upper="15"/>'
            "</prior>"
        )
    with open(os.path.join(d, "likelihood.xml"), "w") as f:
        f.write('<bcm_likelihood type="banana" dimension="2" sd1="1" sd2="0.2"/>')

    varset = VariableSet.from_xml(os.path.join(d, "prior.xml"))
    prior = Prior.from_xml(os.path.join(d, "prior.xml"), varset)
    lik = create_likelihood(os.path.join(d, "likelihood.xml"), varset)
    cfg = PTConfig(
        num_samples=2000,
        use_every_nth=2,
        num_chains=6,
        adapt_proposal_samples=1000,
        adapt_proposal_times=1,
        output_proposal_adaptation=True,
        seed=7,
    )
    sampler = SamplerPT(prior, lik, cfg)
    handler = SampleHandlerHDF5(
        os.path.join(out, "output.nc"),
        cfg.num_samples,
        varset.names,
        varset.transforms,
        sampler.ladder,
    )
    sampler.sample_handlers.append(handler)
    sampler.run()
    handler.close()
    adapt_file = os.path.join(out, "sampler_adaptation.nc")
    for iteration, record, history in sampler.adaptation_dumps:
        write_adaptation_dump(adapt_file, iteration, record, history)

    res = load_results(os.path.join(out, "output.nc"))
    plots.plot_all_traces(res, os.path.join(out, "traces.png"))
    plots.plot_all_densities(res, prior, os.path.join(out, "densities.png"))
    fig, ax = plt.subplots()
    plots.bivariate_density(res, prior, 0, 1, ax=ax)
    fig.savefig(os.path.join(out, "bivariate.png"), dpi=120)
    adapt = load_bundle(adapt_file)
    fig2, ax2 = plt.subplots()
    plots.adaptation_ellipse_plot(res, adapt, "adapt1", "block1", 0, 1, ax=ax2)
    fig2.savefig(os.path.join(out, "adaptation_ellipses.png"), dpi=120)
    plt.close("all")

    print("wrote:")
    for f in sorted(os.listdir(out)):
        print(" ", os.path.join(out, f))


if __name__ == "__main__":
    main()
