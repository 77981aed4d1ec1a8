from bcm3_tpu.fisa.network import SignalingNetwork
from bcm3_tpu.fisa.likelihood import FISALikelihood, create_fisa_likelihood

__all__ = ["SignalingNetwork", "FISALikelihood", "create_fisa_likelihood"]
