"""Sampler factory: ``sampler.type`` string -> sampler instance.

TPU-native equivalent of the reference factory
(reference: src/sampler/SamplerFactory.cpp:22-43).
"""

from __future__ import annotations

from typing import Dict

from bcm3_tpu.sampler.importance import ISConfig, SamplerIS
from bcm3_tpu.sampler.pt import SamplerPT


def create_sampler(prior, likelihood, opts: Dict[str, str]):
    """Build a sampler from a merged option map (see io.config.load_options)."""
    from bcm3_tpu.io.config import load_options, pt_config_from_options

    opts = load_options(None, opts)  # fill in defaults for missing keys
    stype = opts.get("sampler.type", "ptmh")
    if stype in ("ptmh", "parallel_tempered_Metropolis_Hastings"):
        return SamplerPT(prior, likelihood, pt_config_from_options(opts))
    if stype in ("is", "importance_sampling"):
        cfg = ISConfig(
            num_samples=int(opts.get("sampler.num_samples", "2500")),
            use_every_nth=int(opts.get("sampler.use_every_nth", "1")),
            seed=int(opts.get("sampler.rngseed", "0")),
            batch_size=int(opts.get("issampler.batch_size", "1024")),
        )
        return SamplerIS(prior, likelihood, cfg)
    raise ValueError(f"Unknown sampler.type '{stype}' (expected ptmh|is)")
