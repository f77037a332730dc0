"""Exact i.i.d. posterior sampling for the eight-schools model.

The model (mu ~ N(0,5), tau ~ HalfCauchy(5), theta_j ~ N(mu, tau),
y_j ~ N(theta_j, sigma_j)) factorizes exactly:

    p(tau | y)            1-D, sampled by inverse CDF on a fine grid
    p(mu | tau, y)        Gaussian (conjugate after marginalizing theta)
    p(theta_j | mu, tau, y)  independent Gaussians (conjugate)

so draws are exact and i.i.d. — strictly better posterior quality than any
MCMC run (reff ~ 1, zero bias), which is what the bundled example datasets
need to reproduce the reference README's loo() output within rounding.
"""

from __future__ import annotations

import numpy as np

Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
MU_SD = 5.0  # prior mu ~ N(0, 5)
TAU_SCALE = 5.0  # prior tau ~ HalfCauchy(5)

# tau grid: posterior mass is effectively zero beyond ~60 for these data
_TAU_MAX = 80.0
_TAU_N = 400_001


def _log_post_tau(tau, y=Y, sigma=SIGMA):
    """log p(tau | y) up to a constant (theta and mu integrated out)."""
    v = sigma**2 + tau[:, None] ** 2  # (T, 8)
    w_sum = np.sum(1.0 / v, axis=1)
    b = np.sum(y / v, axis=1)
    a = w_sum + 1.0 / MU_SD**2
    loglik = (
        -0.5 * np.sum(np.log(v), axis=1)
        - 0.5 * np.sum(y**2 / v, axis=1)
        - 0.5 * np.log(a * MU_SD**2)
        + 0.5 * b**2 / a
    )
    logprior = -np.log1p((tau / TAU_SCALE) ** 2)
    return loglik + logprior


_GRID_CACHE: dict = {}


def _tau_cdf(y, sigma):
    key = (tuple(y), tuple(sigma))
    if key not in _GRID_CACHE:
        grid = np.linspace(0.0, _TAU_MAX, _TAU_N)[1:]  # exclude tau=0
        logp = _log_post_tau(grid, np.asarray(y), np.asarray(sigma))
        p = np.exp(logp - logp.max())
        cdf = np.cumsum(p)
        cdf /= cdf[-1]
        _GRID_CACHE[key] = (grid, cdf)
    return _GRID_CACHE[key]


def _inv_cdf_tau(u, grid, cdf):
    idx = np.searchsorted(cdf, u)
    # within-cell jitter: linear interpolation of the inverse CDF
    lo = np.where(idx > 0, cdf[np.maximum(idx - 1, 0)], 0.0)
    lo = np.where(idx > 0, lo, 0.0)
    hi = cdf[np.minimum(idx, len(cdf) - 1)]
    frac = (u - lo) / np.maximum(hi - lo, 1e-300)
    step = grid[1] - grid[0]
    return grid[np.minimum(idx, len(grid) - 1)] - step + frac * step


def _ar1(rng, rho, shape):
    """Stationary AR(1) N(0,1) stream along axis 1 of ``shape = (C, T, ...)``."""
    eps = rng.standard_normal(shape)
    if rho == 0.0:
        return eps
    z = np.empty_like(eps)
    z[:, 0] = eps[:, 0]
    c = np.sqrt(1.0 - rho**2)
    for t in range(1, shape[1]):
        z[:, t] = rho * z[:, t - 1] + c * eps[:, t]
    return z


def sample_exact(n_chains, n_draws, seed, *, rho=0.0, y=Y, sigma=SIGMA):
    """Exact posterior draws of (mu, tau, theta), optionally autocorrelated.

    ``rho = 0`` gives i.i.d. draws.  ``rho > 0`` runs each underlying uniform
    / normal stream through a stationary Gaussian-copula AR(1): every single
    draw still has the *exact* joint posterior distribution, but consecutive
    draws within a chain are dependent — emulating MCMC output quality
    (reff < 1) with a known, tunable dependence instead of sampler bias.
    Shapes are ``(C, T)`` / ``(C, T, 8)``.
    """
    from scipy.special import ndtr

    rng = np.random.default_rng(seed)
    grid, cdf = _tau_cdf(y, sigma)
    u = ndtr(_ar1(rng, rho, (n_chains, n_draws)))
    tau = _inv_cdf_tau(u, grid, cdf)

    v = sigma**2 + tau[..., None] ** 2
    w_sum = np.sum(1.0 / v, axis=-1)
    b = np.sum(y / v, axis=-1)
    a = w_sum + 1.0 / MU_SD**2
    mu = b / a + _ar1(rng, rho, (n_chains, n_draws)) / np.sqrt(a)

    w = 1.0 / sigma**2 + 1.0 / tau[..., None] ** 2  # (C, T, 8)
    mean = (y / sigma**2 + mu[..., None] / tau[..., None] ** 2) / w
    theta = mean + _ar1(rng, rho, (n_chains, n_draws, 8)) / np.sqrt(w)
    return mu, tau, theta


def flat_draws_centered(n_chains, n_draws, seed, *, rho=0.0):
    """(C, T, 10) flat unconstrained draws in [mu, log_tau, theta] order."""
    mu, tau, theta = sample_exact(n_chains, n_draws, seed, rho=rho)
    flat = np.concatenate(
        [mu[..., None], np.log(tau)[..., None], theta], axis=-1
    )
    return flat


def flat_draws_noncentered(n_chains, n_draws, seed, *, rho=0.0):
    """(C, T, 10) flat draws in [mu, log_tau, theta_t] order."""
    mu, tau, theta = sample_exact(n_chains, n_draws, seed, rho=rho)
    theta_t = (theta - mu[..., None]) / tau[..., None]
    flat = np.concatenate(
        [mu[..., None], np.log(tau)[..., None], theta_t], axis=-1
    )
    return flat
