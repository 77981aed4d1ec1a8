from bcm3_tpu.distributions import univariate
from bcm3_tpu.distributions.mvn import (
    logpdf_mvn,
    logpdf_mvn_chol,
    logpdf_mvt,
    logpdf_mvt_chol,
)

__all__ = [
    "univariate",
    "logpdf_mvn",
    "logpdf_mvn_chol",
    "logpdf_mvt",
    "logpdf_mvt_chol",
]
