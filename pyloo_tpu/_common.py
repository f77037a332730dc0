"""Shared host-side plumbing for the top-level estimators."""

from __future__ import annotations

import warnings

import numpy as np

from .containers import DataArray
from .ops.ess import relative_eff
from .rcparams import rcParams

__all__ = ["resolve_scale", "clean_log_likelihood", "compute_reff", "good_k_threshold"]


def resolve_scale(scale):
    """Map scale name -> (name, multiplier): log=1, negative_log=-1, deviance=-2."""
    scale = rcParams["stats.ic_scale"] if scale is None else scale.lower()
    if scale == "deviance":
        return scale, -2
    if scale == "log":
        return scale, 1
    if scale == "negative_log":
        return scale, -1
    raise TypeError('Valid scale values are "deviance", "log", "negative_log"')


def clean_log_likelihood(log_likelihood: DataArray, context="LOO", clean_inf=False):
    """Replace NaN (and optionally ±inf) log-lik values with ±1e10, warning.

    Mirrors reference behavior at ``pyloo/loo.py:218-227`` and
    ``pyloo/waic.py:110-132``.
    """
    # the NaN/inf scans are order-independent, so run them on whatever layout
    # the payload currently has — a lazily-stacked array stays lazy (and keeps
    # its device fast path) when the data is clean, which is the common case
    scan_values = log_likelihood._elementwise_values()
    values = None
    if np.any(np.isnan(scan_values)):
        warnings.warn(
            f"NaN values detected in log-likelihood. These will be ignored in"
            f" the {context} calculation.",
            UserWarning,
            stacklevel=3,
        )
        values = np.where(np.isnan(log_likelihood.values), -1e10, log_likelihood.values)
        log_likelihood = DataArray(
            values, log_likelihood.dims, dict(log_likelihood.coords),
            log_likelihood.name,
        )
    if clean_inf and np.any(np.isinf(values if values is not None else scan_values)):
        warnings.warn(
            f"Infinite values detected in log-likelihood. These will be"
            f" ignored in the {context} calculation.",
            UserWarning,
            stacklevel=3,
        )
        values = log_likelihood.values if values is None else values
        values = np.where(
            np.isinf(values), np.where(values > 0, 1e10, -1e10), values
        )
        log_likelihood = DataArray(
            values, log_likelihood.dims, dict(log_likelihood.coords),
            log_likelihood.name,
        )
    return log_likelihood


def compute_reff(inference_data, reff, n_samples):
    """Relative MCMC efficiency from the posterior group (mean-method ESS).

    Mirrors reference ``pyloo/loo.py:204-216``: 1.0 for single-chain data,
    otherwise mean ESS across all parameter elements divided by S.
    """
    if reff is not None:
        return reff
    if not hasattr(inference_data, "posterior"):
        raise TypeError("Must be able to extract a posterior group from data.")
    posterior = inference_data.posterior
    first = next(iter(posterior.data_vars.values()))
    n_chains = first.sizes.get("chain", 1)
    if n_chains == 1:
        return 1.0
    return relative_eff(
        {name: var.values for name, var in posterior.data_vars.items()}, n_samples
    )


def good_k_threshold(n_samples):
    """min(1 - 1/log10(S), 0.7) — reference ``pyloo/loo.py:249``."""
    return min(1 - 1 / np.log10(n_samples), 0.7)
