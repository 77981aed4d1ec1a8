"""Checkpoint/resume tests — a capability the reference lacks (SURVEY §5)."""

import numpy as np

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import PTConfig, SamplerPT

REF = "/root/reference/examples"


def _setup():
    varset = VariableSet.from_xml(f"{REF}/banana/prior.xml")
    prior = Prior.from_xml(f"{REF}/banana/prior.xml", varset)
    lik = create_likelihood(f"{REF}/banana/likelihood.xml", varset)
    return prior, lik


def test_checkpoint_resume_identical(tmp_path):
    """A run interrupted at an adaptation boundary and resumed must
    reproduce the uninterrupted run exactly (same RNG keys, proposals,
    history)."""
    prior, lik = _setup()
    ck = str(tmp_path / "state.ckpt")
    common = dict(
        num_samples=120,
        use_every_nth=2,
        num_chains=4,
        adapt_proposal_samples=40,
        adapt_proposal_times=2,
        seed=11,
    )

    # uninterrupted reference run
    full = SamplerPT(prior, lik, PTConfig(**common)).run()

    # interrupted run: stop after the first segment by asking for only the
    # samples up to the first adaptation, with checkpointing on
    s1 = SamplerPT(prior, lik, PTConfig(checkpoint_file=ck, **common))
    # monkey-run only the first segment: emulate a crash by limiting
    # num_samples to the first adaptation boundary
    cfg_first = PTConfig(checkpoint_file=ck, **{**common, "num_samples": 40})
    part1 = SamplerPT(prior, lik, cfg_first).run()

    # resumed run continues to the full 120 samples
    s2 = SamplerPT(prior, lik, PTConfig(checkpoint_file=ck, **common))
    part2 = s2.run()

    assert part1["samples"].shape[0] == 40
    assert part2["samples"].shape[0] == 80
    joined = np.concatenate([part1["samples"], part2["samples"]], axis=0)
    np.testing.assert_allclose(joined, full["samples"], rtol=1e-12)


def test_checkpoint_restores_counters(tmp_path):
    prior, lik = _setup()
    ck = str(tmp_path / "state.ckpt")
    cfg = PTConfig(
        num_samples=60,
        num_chains=3,
        adapt_proposal_samples=20,
        adapt_proposal_times=1,
        seed=3,
        checkpoint_file=ck,
    )
    SamplerPT(prior, lik, cfg).run()
    s2 = SamplerPT(prior, lik, cfg)
    res = s2.run()  # fully finished -> resumes and returns empty tail
    assert res["samples"].shape[0] == 0
    assert s2.adaptations_done == 1
