from bcm3_tpu.stats.gmm import GMM, fit_gmm, fit_gmm_best_aic
from bcm3_tpu.stats.summary import acf, cor, cov, effective_sample_size

__all__ = [
    "GMM",
    "fit_gmm",
    "fit_gmm_best_aic",
    "acf",
    "cor",
    "cov",
    "effective_sample_size",
]
