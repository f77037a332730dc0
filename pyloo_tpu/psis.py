"""Pareto smoothed importance sampling — public API.

Equivalent of reference ``pyloo/psis.py:25-111`` (``psislw``) over the batched
TPU kernel in :mod:`pyloo_tpu.ops.psis`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .base import ISMethod, compute_importance_weights

__all__ = ["psislw", "ImportanceSamplingResult"]


@dataclass(frozen=True)
class ImportanceSamplingResult:
    """Bundle of everything an importance-sampling pass produced.

    Mirrors the result container the reference exposes from ``psis.py`` so
    downstream code (moment matching, resampling) can consume either library
    interchangeably.

    Attributes
    ----------
    samples : np.ndarray
        The (possibly resampled) posterior draws the weights refer to.
    log_weights : np.ndarray
        Smoothed, truncated, self-normalized log importance weights.
    pareto_k : np.ndarray or float or None
        GPD shape diagnostic(s); ``None`` for methods without one (SIS/TIS).
    warnings : list of str
        Human-readable diagnostics accumulated while computing the weights.
    method : str or None
        Name of the importance-sampling method that produced the weights.
    """

    samples: np.ndarray
    log_weights: np.ndarray
    pareto_k: np.ndarray | float | None = None
    warnings: list[str] = field(default_factory=list)
    method: str | None = "psis"


def psislw(log_weights, reff: float = 1.0):
    """Pareto smoothed importance sampling (PSIS).

    Parameters
    ----------
    log_weights : DataArray or (..., S) array-like
        Log importance weights; the ``__sample__`` dimension (or last axis for
        plain arrays) indexes posterior draws.
    reff : float, default 1
        Relative MCMC efficiency ``ess / S``; sizes the smoothed tail.

    Returns
    -------
    lw_out
        Smoothed, truncated and self-normalized log weights.
    kss
        Estimated shape parameter k of the generalized Pareto distribution,
        per observation (``inf`` when fewer than 5 tail samples exist).

    References
    ----------
    Vehtari et al. (2024). Pareto smoothed importance sampling. JMLR 25(72).
    """
    lw, k = compute_importance_weights(log_weights, method=ISMethod.PSIS, reff=reff)
    if hasattr(k, "rename"):
        k = k.rename("pareto_shape")
    return lw, k
