from bcm3_tpu.sampler.pt import PTConfig, SamplerPT, temperature_ladder

__all__ = ["PTConfig", "SamplerPT", "temperature_ladder"]
