"""Batched on-device GMM EM for proposal adaptation.

TPU-native counterpart of the host EM in :mod:`bcm3_tpu.stats.gmm`
(itself a faithful mirror of the reference GMM fit, src/stats/GMM.cpp
Fit:48-160). The reference fits one GMM per (chain, block) per component
count sequentially on CPU threads; adaptation is the only point where
the sampler's device pipeline stalls on the host. Here every
(component-count k, retry) EM fit runs as ONE vmapped, jit-compiled
computation: fits are padded to the largest k in the ladder with
inactive-component masks, the 100-step EM loop is a `lax.scan` with
per-fit freeze flags once a fit converges/stops/goes singular, and the
M-step's ESS-aware eigenvalue shrinkage (GMM.cpp
CalculateMeanCovariance:248-336) is a batched `eigh`.

Semantics follow the host implementation with two documented deviations:
- k-means++ seeds for all retries are drawn up front (the host path only
  draws a retry's seed when the previous retry failed), so the RNG
  stream differs — fits are equally valid but not bit-identical.
- the reference runs retries sequentially and stops at the first
  converged one; here all retries run in parallel and the first
  converged (else the last non-singular) is selected, which matches the
  sequential choice whenever convergence flags agree.

Selection across component counts (AIC with ESS gating, including the
adjusted-AIC incumbent quirk) is identical to the host path
(reference: ProposalGaussianMixture.cpp InitializeImpl:129-210).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bcm3_tpu.stats.gmm import (
    COMPONENT_LADDER,
    GMM,
    _EM_RETRIES,
    _LOGL_EPSILON,
    _MAX_EM_STEPS,
    _kmeanspp,
    fit_gmm,
)
from bcm3_tpu.stats.summary import effective_sample_size



def _m_step(samples, resp, active, ess_factor):
    """Batched weighted mean/covariance with eigenvalue shrinkage
    (reference: GMM.cpp CalculateMeanCovariance:248-336). resp: (n, K)."""
    n, D = samples.shape
    w = jnp.where(resp >= jnp.finfo(samples.dtype).eps, resp, 0.0)  # (n, K)
    wsum = w.sum(axis=0)  # (K,)
    safe_wsum = jnp.maximum(wsum, 1e-300)
    mean = (w.T @ samples) / safe_wsum[:, None]  # (K, D)
    grand_mean = samples.mean(axis=0)
    low_w = wsum < 2.0
    mean = jnp.where(low_w[:, None], grand_mean, mean)

    d = samples[None, :, :] - mean[:, None, :]  # (K, n, D)
    cov = jnp.einsum("nk,kni,knj->kij", w, d, d) / jnp.maximum(
        wsum - 1.0, 1e-300
    )[:, None, None]

    # regularization
    n_eff = wsum / ess_factor
    diag_only = n_eff < 2.0
    n_eff = jnp.maximum(n_eff, float(D))

    var = jnp.diagonal(cov, axis1=-2, axis2=-1)
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    sd = jnp.where(sd > 0, sd, 1e-150)
    corr = cov / (sd[:, :, None] * sd[:, None, :])
    eye = jnp.eye(D, dtype=samples.dtype)
    corr = corr * (1.0 - eye) + eye

    eigval, eigvec = jnp.linalg.eigh(corr)  # ascending, (K, D), (K, D, D)
    # descending-position shrinkage: position i (descending) scaled by
    # n_eff/(n_eff + D + 1 - 2i) while i < floor(n_eff), zeroed beyond
    i_desc = jnp.arange(D, dtype=samples.dtype)
    factor = n_eff[:, None] / (n_eff[:, None] + D + 1.0 - 2.0 * i_desc[None, :])
    keep = i_desc[None, :] < jnp.floor(n_eff)[:, None]
    eig_desc = eigval[:, ::-1]
    shrunk_desc = jnp.where(keep, eig_desc * factor, 0.0)
    shrunk = shrunk_desc[:, ::-1]
    corr = jnp.einsum("kij,kj,klj->kil", eigvec, shrunk, eigvec)
    cov_reg = corr * (sd[:, :, None] * sd[:, None, :]) + 1e-8 * eye

    diag_cov = var[:, :, None] * eye
    cov_out = jnp.where(diag_only[:, None, None], diag_cov, cov_reg)
    cov_out = jnp.where(low_w[:, None, None], eye, cov_out)
    # inactive padding components: identity (never used, keeps cholesky ok)
    cov_out = jnp.where(active[:, None, None], cov_out, eye)
    mean = jnp.where(active[:, None], mean, 0.0)
    weights = jnp.where(active, wsum / n, 0.0)
    return mean, cov_out, weights


def _e_step(samples, means, covs, weights, active):
    """Batched expectation (reference: GMM.cpp EM_expectation). Returns
    (resp (n,K), logl, singular).

    Uses a batched eigendecomposition instead of Cholesky + triangular
    solve: trsm is sequential over D and maps poorly to the TPU, while
    eigh lowers to a matmul-dominated QDWH iteration and the Mahalanobis
    terms become MXU einsums."""
    n, D = samples.shape
    eigval, eigvec = jnp.linalg.eigh(covs)  # (K, D), (K, D, D)
    # positive definite up to the decomposition's own precision: f32 eigh
    # of a PD matrix can report slightly negative eigenvalues, which the
    # host path's f64 Cholesky would accept (GMM.cpp:102-110)
    tol = (
        D
        * jnp.finfo(samples.dtype).eps
        * jnp.max(jnp.abs(eigval), axis=-1, keepdims=True)
    )
    pd = jnp.all(eigval > -tol, axis=-1) | ~active
    singular = ~jnp.all(pd)
    safe_eig = jnp.maximum(eigval, jnp.maximum(tol, 1e-300))
    log_c = -0.5 * jnp.sum(jnp.log(safe_eig), axis=-1) - 0.5 * D * jnp.log(
        2.0 * jnp.pi
    )
    diff = samples[None, :, :] - means[:, None, :]  # (K, n, D)
    proj = jnp.einsum("knd,kde->kne", diff, eigvec) * jax.lax.rsqrt(safe_eig)[
        :, None, :
    ]
    quad = -0.5 * jnp.sum(proj * proj, axis=-1)  # (K, n)
    logw = jnp.where(
        active & (weights > 0), jnp.log(jnp.maximum(weights, 1e-300)), -jnp.inf
    )
    comp_lp = (log_c[:, None] + quad + logw[:, None]).T  # (n, K)
    m = jnp.max(comp_lp, axis=1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sum_exp = jnp.sum(jnp.exp(comp_lp - m_safe), axis=1)
    sample_logl = m_safe[:, 0] + jnp.log(jnp.maximum(sum_exp, 1e-300))
    logl = jnp.sum(sample_logl)
    resp = jnp.exp(comp_lp - sample_logl[:, None])
    zero_rows = resp.sum(axis=1) == 0
    k_active = jnp.maximum(jnp.sum(active), 1)
    uniform = jnp.where(active, 1.0 / k_active, 0.0)
    resp = jnp.where(zero_rows[:, None], uniform[None, :], resp)
    return resp, logl, singular


@partial(jax.jit, static_argnames=("max_steps",))
def _em_fits(samples, resp0, active, ess_factor, max_steps: int = _MAX_EM_STEPS):
    """Run all padded EM fits. resp0: (F, n, K); active: (F, K).
    Returns means (F,K,D), covs, weights, logl (F,), converged (F,),
    singular (F,)."""

    def one_fit(r0, act):
        mean0, cov0, _ = _m_step(samples, r0, act, ess_factor)
        # initial weights are uniform over active components, matching the
        # host path (gmm.py fit_gmm: weights = 1/K before the first E-step)
        k_act = jnp.maximum(jnp.sum(act), 1)
        w0 = jnp.where(act, 1.0 / k_act, 0.0)

        def step(carry):
            mean, cov, w, prev_logl, logl, stopped, conv, sing, it = carry
            resp, new_logl, singular = _e_step(samples, mean, cov, w, act)
            eps = jnp.abs(new_logl) * _LOGL_EPSILON
            decreased = new_logl < prev_logl
            small_dec = (prev_logl - new_logl) < eps * 10.0
            small_inc = (new_logl - prev_logl) < eps
            now_conv = jnp.where(decreased, small_dec, small_inc)
            stop_now = singular | decreased | small_inc

            n_mean, n_cov, n_w = _m_step(samples, resp, act, ess_factor)
            upd = ~(stopped | stop_now)
            mean = jnp.where(upd, n_mean, mean)
            cov = jnp.where(upd, n_cov, cov)
            w = jnp.where(upd, n_w, w)
            logl = jnp.where(stopped, logl, new_logl)
            conv = jnp.where(stopped, conv, now_conv & ~singular)
            sing = sing | (singular & ~stopped)
            prev_logl = jnp.where(stopped, prev_logl, new_logl)
            stopped = stopped | stop_now
            return (mean, cov, w, prev_logl, logl, stopped, conv, sing, it + 1)

        def keep_going(carry):
            stopped, it = carry[5], carry[8]
            return (~stopped) & (it < max_steps)

        big_neg = jnp.asarray(jnp.finfo(samples.dtype).min / 4, samples.dtype)
        init = (
            mean0,
            cov0,
            w0,
            big_neg,
            big_neg,
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        # early-exit loop: under vmap this runs until every fit in the
        # batch has stopped (or hit max_steps), matching the host path's
        # per-fit early break instead of always paying 100 EM steps
        mean, cov, w, _, logl, stopped, conv, sing, _ = jax.lax.while_loop(
            keep_going, step, init
        )
        # fits that ran out of steps without stopping: converged=False
        return mean, cov, w, logl, conv & stopped, sing

    return jax.vmap(one_fit)(resp0, active)


def fit_gmm_best_aic_device(
    history: np.ndarray,
    rng: np.random.Generator,
    select_with_adjusted_aic: bool = False,
    log=None,
) -> Optional[GMM]:
    """Device-batched drop-in for :func:`bcm3_tpu.stats.gmm.fit_gmm_best_aic`."""
    history = np.asarray(history, dtype=np.float64)
    n, D = history.shape
    if n < 2:
        return None

    ess = np.array([effective_sample_size(history[:, i]) for i in range(D)])
    min_ess = float(np.min(ess))
    if not np.isfinite(min_ess) or min_ess <= 0:
        min_ess = 1.0
    aic_adjust_factor = min_ess / n
    ess_factor = n / min_ess

    # eligible multi-component ks (k=1 is closed form: host, cheap)
    ks = [
        k
        for k in COMPONENT_LADDER
        if k > 1
        and min_ess >= k * (1 + min(D // 2, 10))
        and n >= 2.0 * D * k
    ]

    candidates = []  # (k, GMM)
    if min_ess >= 1 * (1 + min(D // 2, 10)):
        g1 = fit_gmm(history, 1, rng, ess_factor)
        if g1 is not None:
            candidates.append(g1)
        elif log:
            log("GMM k=1: fit failed")

    if ks:
        Kmax = max(ks)
        fits = []  # (k, resp0 padded)
        fit_meta = []
        for k in ks:
            for _r in range(_EM_RETRIES):
                resp = _kmeanspp(history, k, rng)
                if resp is None:
                    continue
                padded = np.zeros((n, Kmax))
                padded[:, :k] = resp
                fits.append(padded)
                fit_meta.append(k)
        if fits:
            resp0 = jnp.asarray(np.stack(fits))
            active = jnp.asarray(
                np.stack(
                    [np.arange(Kmax) < k for k in fit_meta]
                )
            )
            samples_dev = jnp.asarray(history)
            means, covs, weights, logl, conv, sing = jax.tree_util.tree_map(
                np.asarray,
                _em_fits(
                    samples_dev, resp0, active, jnp.asarray(float(ess_factor))
                ),
            )
            # per k: first converged retry, else last non-singular
            for k in ks:
                idx = [i for i, kk in enumerate(fit_meta) if kk == k]
                chosen = None
                for i in idx:
                    if conv[i] and not sing[i]:
                        chosen = i
                        break
                if chosen is None:
                    non_sing = [i for i in idx if not sing[i]]
                    if non_sing:
                        chosen = non_sing[-1]
                if chosen is None:
                    if log:
                        log(f"GMM k={k}: fit failed (all retries singular)")
                    continue
                g = GMM.from_params(
                    means[chosen][:k], covs[chosen][:k], weights[chosen][:k]
                )
                if g is None:
                    if log:
                        log(f"GMM k={k}: final cholesky failed")
                    continue
                nparam = k * (D + D * (D + 1) // 2) + k - 1
                g.logl = float(logl[chosen])
                g.aic = 2 * nparam - 2 * g.logl
                candidates.append(g)

    best_gmm = None
    best_aic = np.inf
    for g in candidates:
        adjusted_aic = g.aic + 2.0 * (1.0 - aic_adjust_factor) * g.logl
        crit = adjusted_aic if select_with_adjusted_aic else g.aic
        if log:
            log(
                f"GMM k={g.num_components}: AIC={g.aic:.6g}, "
                f"adjusted AIC={adjusted_aic:.6g}"
            )
        if crit < best_aic:
            best_gmm = g
            best_aic = g.aic
    return best_gmm
