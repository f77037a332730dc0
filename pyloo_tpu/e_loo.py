"""Weighted expectations under importance-sampling weights.

Capability-equivalent to reference ``pyloo/e_loo.py:56-559``: weighted
mean/variance/sd/quantile of posterior(-predictive) samples under PSIS
weights, with the function-specific Pareto-k diagnostic, minimum sample
size, k-hat threshold, and convergence rate.  All per-observation numerics
run as batched device kernels (:mod:`pyloo_tpu.ops.expectations`).

Note: the reference's ``k_hat`` (e_loo.py:350-357) feeds a descending tail
containing an exact zero into the GPD fit; the infinite ``1/ary[-1]`` term
collapses the fit and the r-tail diagnostic always returns the prior constant
``5/(tail_len+10)``.  This implementation computes the intended diagnostic
(exceedances over the (tail_len+1)-th order statistic, ascending).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np

from .base import as_sample_matrix
from .containers import DataArray
from .ops.expectations import (
    khat_batch,
    weighted_mean_batch,
    weighted_quantile_batch,
    weighted_variance_batch,
)
from .utils import to_inference_data

__all__ = [
    "e_loo",
    "ExpectationResult",
    "compute_pareto_k",
    "k_hat",
    "_pareto_min_ss",
    "_pareto_khat_threshold",
    "_pareto_convergence_rate",
]


@dataclass
class ExpectationResult:
    """Results of a weighted expectation.

    ``value`` carries the expectation (quantile outputs gain a trailing
    ``quantile`` dimension); ``pareto_k`` the function-specific diagnostic;
    ``min_ss`` / ``khat_threshold`` / ``convergence_rate`` the reliability
    measures of Vehtari et al. (2024) §4.
    """

    value: Any
    pareto_k: Any
    min_ss: Any = None
    khat_threshold: Any = None
    convergence_rate: Any = None


def _as_matrix_pair(x_da, lw_da):
    """Align h(theta) samples and log-weights into matching (B, S) matrices.

    A per-draw quantity without observation dimensions (e.g. a scalar
    posterior parameter) broadcasts across the weights' observation axis,
    mirroring the reference's xarray broadcasting (e_loo.py:429-436): the
    result is then h's expectation under each observation's LOO weights.
    """
    x_matrix, S_x, x_rebuild = as_sample_matrix(x_da)
    lw_matrix, S_w, lw_rebuild = as_sample_matrix(lw_da)
    if S_x != S_w:
        raise ValueError(
            f"x has {S_x} draws but log_weights has {S_w}"
        )
    if x_matrix.shape != lw_matrix.shape:
        if x_matrix.shape[0] == 1:
            x_matrix = np.broadcast_to(x_matrix, lw_matrix.shape)
            return x_matrix, lw_matrix, lw_rebuild
        raise ValueError(
            f"x {x_matrix.shape} and log_weights {lw_matrix.shape} must have"
            " the same shape (or x must have no observation dimensions)"
        )
    return x_matrix, lw_matrix, x_rebuild


def e_loo(
    data,
    var_name: str | None = None,
    group: str = "posterior_predictive",
    weights=None,
    log_weights=None,
    log_ratios=None,
    type: str = "mean",
    probs: float | Sequence[float] | None = None,
) -> ExpectationResult:
    """Compute weighted expectations of posterior(-predictive) samples.

    Parameters
    ----------
    data : InferenceData, DataArray, or convertible
        Samples of h(theta); ``var_name``/``group`` select the variable when
        an InferenceData is given.
    weights, log_weights : DataArray or array
        Importance sampling weights (one of the two required), typically the
        smoothed weights from :func:`pyloo_tpu.psislw`.
    log_ratios : optional
        Raw (unsmoothed) log ratios for sharper Pareto-k diagnostics.
    type : {"mean", "variance", "sd", "quantile"}
    probs : float or sequence, required for quantiles.

    Examples
    --------
    .. code-block:: python

        import pyloo_tpu as pl

        idata = pl.load_example_data("centered_eight")
        ll = idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        lw, k = pl.psislw(-ll)
        means = pl.e_loo(idata, group="posterior", var_name="theta",
                         log_weights=lw, log_ratios=-ll)
        means.value              # LOO-weighted posterior means
        means.pareto_k           # function-specific reliability diagnostic
    """
    if type not in ["mean", "variance", "sd", "quantile"]:
        raise ValueError("type must be 'mean', 'variance', 'sd' or 'quantile'")

    probs_array = None
    if type == "quantile":
        if probs is None:
            raise ValueError("probs must be provided for quantile calculation")
        probs_array = np.atleast_1d(np.asarray(probs, dtype=np.float64))
        if not np.all((probs_array > 0) & (probs_array < 1)):
            raise ValueError("probs must be between 0 and 1")

    if weights is None and log_weights is None:
        raise ValueError("Either weights or log_weights must be provided")

    if isinstance(data, DataArray):
        x_data = data
    else:
        idata = to_inference_data(data)
        if not hasattr(idata, group):
            raise ValueError(f"InferenceData object does not have a {group} group")
        data_group = getattr(idata, group)
        if var_name is None:
            var_names = list(data_group.data_vars)
            if len(var_names) == 1:
                var_name = var_names[0]
            else:
                raise ValueError(
                    f"Multiple variables found in {group} group. Please specify"
                    f" var_name from: {var_names}"
                )
        elif var_name not in data_group.data_vars:
            raise ValueError(
                f"Variable '{var_name}' not found in {group} group. Available"
                f" variables: {list(data_group.data_vars)}"
            )
        x_data = data_group[var_name]

    if "chain" in x_data.dims and "draw" in x_data.dims:
        x_data = x_data.stack(__sample__=("chain", "draw"))

    if weights is not None:
        w_values = weights.values if isinstance(weights, DataArray) else np.asarray(weights)
        log_w = np.log(w_values)
        log_weights = (
            DataArray(log_w, weights.dims, dict(weights.coords))
            if isinstance(weights, DataArray)
            else log_w
        )

    if isinstance(log_weights, DataArray) and "__sample__" not in log_weights.dims:
        if "chain" in log_weights.dims and "draw" in log_weights.dims:
            log_weights = log_weights.stack(__sample__=("chain", "draw"))
        else:
            sample_dim = log_weights.dims[-1]
            new_dims = log_weights.dims[:-1] + ("__sample__",)
            log_weights = DataArray(
                log_weights.values, new_dims,
                {d: c for d, c in log_weights.coords.items() if d in new_dims[:-1]},
            )

    if not isinstance(log_weights, DataArray):
        log_weights = DataArray(
            np.asarray(log_weights),
            x_data.dims if np.asarray(log_weights).ndim == x_data.ndim else None,
        )

    x_matrix, lw_matrix, rebuild = _as_matrix_pair(x_data, log_weights)
    n_samples = x_matrix.shape[1]

    if type == "mean":
        value_flat = np.asarray(weighted_mean_batch(x_matrix, lw_matrix))
    elif type == "variance":
        value_flat = np.asarray(weighted_variance_batch(x_matrix, lw_matrix))
    elif type == "sd":
        value_flat = np.sqrt(
            np.asarray(weighted_variance_batch(x_matrix, lw_matrix))
        )
    else:
        value_flat = np.asarray(
            weighted_quantile_batch(x_matrix, lw_matrix, probs_array)
        )  # (B, n_probs)

    # diagnostics ---------------------------------------------------------
    if log_ratios is not None:
        lr_matrix, _, _ = as_sample_matrix(
            log_ratios
            if isinstance(log_ratios, DataArray)
            else DataArray(np.asarray(log_ratios))
        )
    else:
        lr_matrix = lw_matrix

    if type == "quantile":
        k_flat = np.asarray(khat_batch(lr_matrix, lr_matrix, use_h=False))
    else:
        h = x_matrix**2 if type in ("variance", "sd") else x_matrix
        k_flat = np.asarray(khat_batch(h, lr_matrix, use_h=True))

    min_ss_flat = np.array([_pareto_min_ss(k) for k in k_flat])
    khat_thresh = _pareto_khat_threshold(n_samples)
    conv_flat = np.array(
        [_pareto_convergence_rate(k, n_samples) for k in k_flat]
    )

    # reshape back to labeled observation dims -----------------------------
    _, k_da = rebuild(np.zeros_like(lw_matrix), k_flat)
    _, min_ss_da = rebuild(np.zeros_like(lw_matrix), min_ss_flat)
    _, conv_da = rebuild(np.zeros_like(lw_matrix), conv_flat)
    if isinstance(k_da, DataArray):
        k_da = k_da.rename("pareto_k")

    if type == "quantile":
        if isinstance(k_da, DataArray):
            obs_dims = k_da.dims
            value = DataArray(
                value_flat.reshape(k_da.shape + (len(probs_array),)),
                obs_dims + ("quantile",),
                {**k_da.coords, "quantile": probs_array},
            )
        else:
            value = value_flat.reshape(np.shape(k_da) + (len(probs_array),))
    else:
        _, value = rebuild(np.zeros_like(lw_matrix), value_flat)

    threshold = (
        DataArray(
            np.full(k_da.shape, khat_thresh), k_da.dims, dict(k_da.coords)
        )
        if isinstance(k_da, DataArray)
        else np.full(np.shape(k_da) or (), khat_thresh)
    )

    return ExpectationResult(
        value=value,
        pareto_k=k_da,
        min_ss=min_ss_da,
        khat_threshold=threshold,
        convergence_rate=conv_da,
    )


def compute_pareto_k(x, log_ratios, tail_len: int = 20):
    """Pareto k diagnostic for expectation estimates (batched).

    ``x`` holds h(theta) values (None for quantile estimates); ``log_ratios``
    the raw log importance ratios.
    """
    if tail_len < 5:
        raise ValueError("tail_len must be at least 5")
    if isinstance(log_ratios, DataArray):
        lr_matrix, _, rebuild = as_sample_matrix(log_ratios)
        if x is not None:
            x_matrix, _, _ = as_sample_matrix(
                x if isinstance(x, DataArray) else DataArray(np.asarray(x))
            )
            k = khat_batch(x_matrix, lr_matrix, tail_len=tail_len, use_h=True)
        else:
            k = khat_batch(lr_matrix, lr_matrix, tail_len=tail_len, use_h=False)
        _, k_da = rebuild(np.zeros_like(lr_matrix), np.asarray(k))
        return k_da.rename("pareto_k") if isinstance(k_da, DataArray) else k_da

    lr = np.atleast_2d(np.asarray(log_ratios))
    if x is not None:
        xx = np.atleast_2d(np.asarray(x))
        if xx.shape != lr.shape:
            raise ValueError("x and log_ratios must have the same shape")
        k = np.asarray(khat_batch(xx, lr, tail_len=tail_len, use_h=True))
    else:
        k = np.asarray(khat_batch(lr, lr, tail_len=tail_len, use_h=False))
    return float(k[0]) if np.asarray(log_ratios).ndim == 1 else k


def k_hat(x_vals, log_ratios_vals, tail_len: int = 20) -> float:
    """Scalar-path Pareto k for one observation (reference e_loo.py:328-390)."""
    lr = np.asarray(log_ratios_vals)[None, :]
    if x_vals is None:
        return float(np.asarray(khat_batch(lr, lr, tail_len=tail_len, use_h=False))[0])
    x = np.asarray(x_vals)[None, :]
    return float(np.asarray(khat_batch(x, lr, tail_len=tail_len, use_h=True))[0])


def _pareto_min_ss(k: float) -> float:
    """Minimum sample size for a reliable Pareto-smoothed estimate."""
    if np.isnan(k):
        return float("inf")
    if k < 1:
        return 10 ** (1 / (1 - max(0, k)))
    return float("inf")


def _pareto_khat_threshold(n_samples: int) -> float:
    """k-hat threshold 1 - 1/log10(S) for reliable estimates."""
    return 1 - 1 / np.log10(n_samples)


def _pareto_convergence_rate(k: float, n_samples: int) -> float:
    """Relative convergence rate vs the CLT for a Pareto-smoothed estimate."""
    if np.isnan(k):
        return 0.0
    if k < 0:
        return 1.0
    if k > 1:
        return 0.0
    if k == 0.5:
        return 1 - 1 / np.log(n_samples)
    if 0 < k < 1:
        n = n_samples
        return max(
            0,
            (2 * (k - 1) * n ** (2 * k + 1) + (1 - 2 * k) * n ** (2 * k) + n**2)
            / ((n - 1) * (n - n ** (2 * k))),
        )
    return 1.0
