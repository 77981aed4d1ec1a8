"""ProgressIndicatorConsole: throttling, MAP trace, sampler wiring
(reference: src/sampler/ProgressIndicatorConsole.cpp, SamplerPT.cpp:223-226)."""

import io

import numpy as np

from bcm3_tpu.io.progress import ProgressIndicatorConsole


def test_progress_throttles_and_tracks_map():
    buf = io.StringIO()
    p = ProgressIndicatorConsole(update_time=1000.0, stream=buf)
    p.start()
    p.notify_max_lposterior(-12.5)
    p.notify_max_lposterior(-20.0)  # lower: must not replace the max
    p.notify_max_lposterior(np.nan)  # non-finite: ignored
    p.update(0.1)  # first update always renders
    assert out_count(buf.getvalue()) == 1
    p.update(0.2)  # throttled (update_time huge, fraction < 1)
    p.update(0.3)
    assert out_count(buf.getvalue()) == 1
    p.update(1.0)  # fraction >= 1 always renders
    out = buf.getvalue()
    assert out_count(out) == 2
    assert "100.0%" in out
    assert "max lposterior: -12.5" in out


def test_progress_zero_throttle_renders_every_update():
    buf = io.StringIO()
    p = ProgressIndicatorConsole(update_time=0.0, stream=buf)
    p.update(0.25)
    p.update(0.5)
    assert out_count(buf.getvalue()) == 2


def out_count(s: str) -> int:
    return s.count("Progress:")


def test_sampler_drives_progress():
    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    ex = "/root/reference/examples/banana"
    varset = VariableSet.from_xml(f"{ex}/prior.xml")
    prior = Prior.from_xml(f"{ex}/prior.xml", varset)
    lik = create_likelihood(f"{ex}/likelihood.xml", varset)
    cfg = PTConfig(
        num_samples=6,
        use_every_nth=1,
        num_chains=2,
        adapt_proposal_samples=0,
        adapt_proposal_times=0,
        emit_chunk_size=2,
        seed=11,
    )
    s = SamplerPT(prior, lik, cfg)
    buf = io.StringIO()
    s.progress = ProgressIndicatorConsole(update_time=0.0, stream=buf)
    s.run()
    out = buf.getvalue()
    assert out_count(out) >= 3  # one per emission chunk
    assert "100.0%" in out
    assert "max lposterior" in out
