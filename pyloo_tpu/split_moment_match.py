"""Split moment matching: half-forward / half-inverse transformed draws.

Capability-equivalent to reference ``pyloo/split_moment_match.py:22-263``:
the first S/2 draws get the accumulated affine transform, the last S/2 its
inverse; the proposal becomes the deterministic two-component mixture, whose
log-density is combined with a stable log1p-exp branch; both the LOO and the
full-posterior weights are re-smoothed.
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np

from .base import ISMethod, compute_importance_weights
from .helpers import (
    _initialize_array,
    compute_updated_r_eff,
    extract_log_likelihood_for_observation,
    log_lik_i_upars,
    log_prob_upars,
)
from .models.wrapper import JAXModelWrapper

__all__ = ["loo_moment_match_split"]


def loo_moment_match_split(
    model,
    upars: np.ndarray,
    cov: bool,
    total_shift: np.ndarray,
    total_scaling: np.ndarray,
    total_mapping: np.ndarray,
    i: int,
    r_eff_i: float,
    log_prob_upars_fn: Callable | None = None,
    log_lik_i_upars_fn: Callable | None = None,
    method: Literal["psis", "sis", "tis"] | ISMethod = "psis",
    verbose: bool = False,
    **kwargs,
):
    """Split-transform importance weights for observation ``i``.

    Returns a dict with ``lwi`` / ``lwfi`` / ``log_liki`` / ``r_eff_i``.
    """
    upars = np.asarray(upars)
    S = upars.shape[0]
    S_half = S // 2
    dim = upars.shape[1]
    mean_original = np.mean(upars, axis=0)

    total_shift = _initialize_array(total_shift, np.zeros, dim)
    total_scaling = _initialize_array(total_scaling, np.ones, dim)
    total_mapping = _initialize_array(total_mapping, np.eye, dim)

    # forward transform
    upars_trans = (upars - mean_original[None, :]) * total_scaling[None, :]
    if cov:
        upars_trans = upars_trans @ total_mapping.T
    upars_trans = upars_trans + (total_shift + mean_original)[None, :]

    # inverse transform
    upars_trans_inv = upars - mean_original[None, :]
    if cov:
        upars_trans_inv = upars_trans_inv @ np.linalg.inv(total_mapping).T
    upars_trans_inv = upars_trans_inv / total_scaling[None, :]
    upars_trans_inv = upars_trans_inv + (mean_original - total_shift)[None, :]

    upars_trans_half = upars.copy()
    upars_trans_half[:S_half] = upars_trans[:S_half]
    upars_trans_half_inv = upars.copy()
    upars_trans_half_inv[S_half:] = upars_trans_inv[S_half:]

    if isinstance(model, JAXModelWrapper):
        log_prob_half_trans = log_prob_upars(model, upars_trans_half)
        log_prob_half_trans_inv = log_prob_upars(model, upars_trans_half_inv)
        ll = log_lik_i_upars(model, upars_trans_half, pointwise=True)
        log_liki_half = extract_log_likelihood_for_observation(ll, i)
    else:
        if None in (log_prob_upars_fn, log_lik_i_upars_fn):
            raise ValueError(
                "When not using JAXModelWrapper, you must provide the following"
                " functions: log_prob_upars_fn and log_lik_i_upars_fn"
            )
        log_prob_half_trans = log_prob_upars_fn(
            model, upars=upars_trans_half, **kwargs
        )
        log_prob_half_trans_inv = log_prob_upars_fn(
            model, upars=upars_trans_half_inv, **kwargs
        )
        log_liki_half = log_lik_i_upars_fn(
            model, upars=upars_trans_half, i=i, **kwargs
        )
        if hasattr(log_liki_half, "flatten"):
            log_liki_half = log_liki_half.flatten()

    log_prob_half_trans = np.asarray(log_prob_half_trans, dtype=np.float64)
    log_prob_half_trans_inv = np.asarray(
        log_prob_half_trans_inv, dtype=np.float64
    )
    log_liki_half = np.asarray(log_liki_half, dtype=np.float64)

    # Jacobian of the inverse map
    log_prob_half_trans_inv = (
        log_prob_half_trans_inv
        - np.sum(np.log(total_scaling))
        - np.log(np.abs(np.linalg.det(total_mapping)))
    )

    # deterministic-mixture denominator, stable in both orderings
    stable = log_prob_half_trans > log_prob_half_trans_inv
    lwi_half = -log_liki_half + log_prob_half_trans
    lwi_half[stable] = lwi_half[stable] - (
        log_prob_half_trans[stable]
        + np.log1p(
            np.exp(log_prob_half_trans_inv[stable] - log_prob_half_trans[stable])
        )
    )
    lwi_half[~stable] = lwi_half[~stable] - (
        log_prob_half_trans_inv[~stable]
        + np.log1p(
            np.exp(log_prob_half_trans[~stable] - log_prob_half_trans_inv[~stable])
        )
    )
    lwi_half[np.isnan(lwi_half)] = -np.inf
    lwi_half[np.isinf(lwi_half) & (lwi_half > 0)] = -np.inf

    lwi_half, _ = compute_importance_weights(lwi_half, method=method, reff=r_eff_i)
    lwi_half = np.asarray(lwi_half)

    lr = lwi_half + log_liki_half
    lr[np.isnan(lr) | (np.isinf(lr) & (lr > 0))] = -np.inf
    lwfi_half, _ = compute_importance_weights(lr, method=method, reff=r_eff_i)

    if isinstance(model, JAXModelWrapper):
        r_eff_i = compute_updated_r_eff(model, i, log_liki_half, S_half, r_eff_i)

    return {
        "lwi": lwi_half,
        "lwfi": np.asarray(lwfi_half),
        "log_liki": log_liki_half,
        "r_eff_i": r_eff_i,
    }
