"""Independent scalar NumPy oracle for PSIS/SIS/TIS used only by tests.

Implements the PSIS procedure of Vehtari, Simpson, Gelman, Yao, Gabry (2024,
JMLR 25(72)) and the Zhang & Stephens (2009) empirical-Bayes GPD fit directly
from the papers, one observation at a time, as a numerical ground truth for
the batched device kernels.  (The reference implementation at
/root/reference computes the same published algorithm; this file is written
against the papers, not that code.)
"""

import numpy as np


def fit_gpd_zhang_stephens(sorted_exceedances):
    """Empirical-Bayes GPD (k, sigma) estimate for an ascending 1-D sample."""
    y = np.asarray(sorted_exceedances, dtype=np.float64)
    n = y.size
    # candidate grid for theta = -k/sigma ("b" in the paper), built from the
    # first-quartile and maximum order statistics
    n_grid = 30 + int(np.floor(np.sqrt(n)))
    j = np.arange(1, n_grid + 1, dtype=np.float64)
    quartile = y[int(n / 4.0 + 0.5) - 1]
    theta = 1.0 / y[-1] + (1.0 - np.sqrt(n_grid / (j - 0.5))) / (3.0 * quartile)

    # profile log-likelihood of each candidate
    k_of_theta = np.array([np.mean(np.log1p(-t * y)) for t in theta])
    ell = n * (np.log(-theta / k_of_theta) - k_of_theta - 1.0)

    # posterior weights over the grid (normalized likelihood)
    rel = ell - ell.max()
    post = np.exp(rel)
    post /= post.sum()
    post[post < 10 * np.finfo(np.float64).eps] = 0.0
    post /= post.sum()

    theta_hat = float(np.sum(theta * post))
    k_hat = float(np.mean(np.log1p(-theta_hat * y)))
    sigma_hat = -k_hat / theta_hat
    # weakly-informative prior shrinkage towards k = 0.5
    k_hat = (n * k_hat + 5.0) / (n + 10.0)
    return k_hat, sigma_hat


def gpd_quantile(p, k, sigma):
    """Inverse CDF of the GPD with shape k, scale sigma at probabilities p."""
    p = np.asarray(p, dtype=np.float64)
    if sigma <= 0:
        return np.full_like(p, np.nan)
    if abs(k) < np.finfo(np.float64).eps:
        return sigma * (-np.log1p(-p))
    return sigma * np.expm1(-k * np.log1p(-p)) / k


def psis_row(raw_log_weights, reff=1.0):
    """PSIS for one observation's log-weight vector. Returns (lw, k_hat)."""
    lw = np.array(raw_log_weights, dtype=np.float64)
    S = lw.size
    lw = lw - lw.max()

    n_tail_max = int(np.ceil(min(S / 5.0, 3.0 * np.sqrt(S / reff))))
    order = np.argsort(lw, kind="stable")
    threshold = max(lw[order[S - n_tail_max - 1]], np.log(np.finfo(float).tiny))

    tail_mask = lw > threshold
    n_tail = int(tail_mask.sum())
    if n_tail <= 4:
        k_hat = np.inf
    else:
        tail_positions = np.nonzero(tail_mask)[0]
        rank = np.argsort(lw[tail_positions], kind="stable")
        exceed = np.exp(lw[tail_positions][rank]) - np.exp(threshold)
        k_hat, sigma_hat = fit_gpd_zhang_stephens(exceed)
        if np.isfinite(k_hat):
            plotting_pos = (np.arange(n_tail) + 0.5) / n_tail
            smoothed = np.log(
                gpd_quantile(plotting_pos, k_hat, sigma_hat) + np.exp(threshold)
            )
            lw[tail_positions[rank]] = smoothed
            lw[lw > 0] = 0.0

    shifted = lw - lw.max()
    lw = lw - (np.log(np.sum(np.exp(shifted))) + lw.max())
    return lw, k_hat


def psis_matrix(lw_matrix, reff=1.0):
    """Apply :func:`psis_row` over rows of an (n_obs, S) matrix."""
    lw_matrix = np.asarray(lw_matrix, dtype=np.float64)
    out = np.empty_like(lw_matrix)
    ks = np.empty(lw_matrix.shape[0])
    for i, row in enumerate(lw_matrix):
        out[i], ks[i] = psis_row(row, reff)
    return out, ks


def sis_row(raw_log_weights):
    lw = np.array(raw_log_weights, dtype=np.float64)
    lw -= lw.max()
    lw -= np.log(np.sum(np.exp(lw - lw.max()))) + lw.max()
    w = np.exp(lw)
    return lw, 1.0 / np.sum(w**2)


def tis_row(raw_log_weights):
    lw = np.array(raw_log_weights, dtype=np.float64)
    S = lw.size
    lw -= lw.max()
    log_zbar = np.log(np.mean(np.exp(lw)))
    lw = np.minimum(lw, log_zbar + 0.5 * np.log(S))
    shifted = lw - lw.max()
    lw = lw - (np.log(np.sum(np.exp(shifted))) + lw.max())
    w = np.exp(lw)
    return lw, 1.0 / np.sum(w**2)


def logmeanexp(x, axis=None):
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    out = np.log(np.mean(np.exp(x - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out
