from bcm3_tpu.sampler.factory import create_sampler
from bcm3_tpu.sampler.importance import ISConfig, SamplerIS
from bcm3_tpu.sampler.pt import PTConfig, SamplerPT, temperature_ladder

__all__ = [
    "PTConfig",
    "SamplerPT",
    "SamplerIS",
    "ISConfig",
    "create_sampler",
    "temperature_ladder",
]
