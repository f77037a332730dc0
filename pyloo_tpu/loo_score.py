"""LOO-CRPS / LOO-SCRPS (Bolin & Wallin 2023).

Capability-equivalent to reference ``pyloo/loo_score.py:48-532``:
``crps = 0.5*E|X-X'| - E|X-y|`` (or the scaled variant) under leave-one-out
importance weights, with E|X-X'| computed under the joint two-sample LOO
weights over shuffled draw pairings.  Unlike the reference (which consumes
the unseeded global ``np.random.permutation``, loo_score.py:306), the
permutations accept an explicit ``seed`` for reproducibility.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np

from ._common import compute_reff, good_k_threshold
from .containers import DataArray, InferenceData
from .e_loo import e_loo
from .psis import psislw
from .rcparams import rcParams
from .utils import get_log_likelihood, to_inference_data

__all__ = ["loo_score", "crps", "scrps", "LooScoreResult"]


@dataclass
class LooScoreResult:
    """CRPS/SCRPS estimates: named (Estimate, SE) record + pointwise values."""

    estimates: np.ndarray
    pointwise: np.ndarray
    pareto_k: Any = None
    good_k: float | None = None
    warning: bool | None = None


def loo_score(
    data,
    x_group: str = "posterior_predictive",
    x_var: str | None = None,
    x2_group: str | None = None,
    x2_var: str | None = None,
    y_group: str = "observed_data",
    y_var: str | None = None,
    var_name: str | None = None,
    pointwise: bool | None = None,
    permutations: int = 1,
    reff: float | None = None,
    scale: bool = False,
    seed: int | None = None,
    **kwargs,
) -> LooScoreResult:
    """Leave-one-out (S)CRPS from two sets of predictive draws.

    ``x`` and ``x2`` are independent predictive sample sets (same shapes);
    ``scale=True`` computes SCRPS ``-E|X-y|/E|X-X'| - 0.5 log E|X-X'|``.
    ``permutations`` averages several shuffled pairings of x2 to reduce the
    variance of E|X-X'|.
    """
    inference_data = to_inference_data(data)
    log_likelihood = get_log_likelihood(inference_data, var_name=var_name)
    pointwise = rcParams["stats.ic_pointwise"] if pointwise is None else pointwise

    x_data, x2_data, y_data, log_likelihood = _get_data(
        inference_data,
        x_group=x_group,
        x_var=x_var,
        x2_group=x2_group,
        x2_var=x2_var,
        y_group=y_group,
        y_var=y_var,
        log_likelihood=log_likelihood,
    )
    _validate_crps_input(x_data, x2_data, y_data, log_likelihood)

    n_samples = x_data.sizes["__sample__"]
    reff = compute_reff(inference_data, reff, n_samples)

    rng = np.random.default_rng(seed)
    repeats = [
        _expected_pairwise_diff_loo(
            x_data, x2_data, log_likelihood, rng, r_eff=reff, **kwargs
        )
        for _ in range(permutations)
    ]
    EXX = sum(r.values for r in repeats) / permutations

    log_weights, pareto_k = psislw(-log_likelihood, reff=reff)

    obs_dims = [d for d in x_data.dims if d != "__sample__"]
    y_aligned = y_data.transpose(*obs_dims).values if obs_dims else y_data.values
    abs_diff = DataArray(
        np.abs(x_data.values - y_aligned[..., None]),
        x_data.dims,
        dict(x_data.coords),
    )
    EXy = e_loo(
        abs_diff, log_weights=log_weights, log_ratios=-log_likelihood, **kwargs
    ).value

    EXy_values = EXy.values if hasattr(EXy, "values") else np.asarray(EXy)
    score_pw = _crps(EXX, EXy_values, scale=scale)

    score_value = float(score_pw.mean())
    score_se = float(score_pw.std() / np.sqrt(score_pw.size))
    estimates = np.array(
        [(score_value, score_se)], dtype=[("Estimate", float), ("SE", float)]
    )[0]

    result = LooScoreResult(estimates=estimates, pointwise=score_pw)

    if pointwise:
        good_k = good_k_threshold(n_samples)
        result.pareto_k = pareto_k
        result.good_k = good_k
        k_values = (
            pareto_k.values if hasattr(pareto_k, "values") else np.asarray(pareto_k)
        )
        if np.any(k_values > good_k):
            n_high_k = int(np.sum(k_values > good_k))
            warnings.warn(
                "Estimated shape parameter of Pareto distribution is greater than"
                f" {good_k:.2f} for {n_high_k} observations. This indicates that"
                " importance sampling may be unreliable because the marginal posterior"
                " and LOO posterior are very different.",
                UserWarning,
                stacklevel=2,
            )
            result.warning = True
        else:
            result.warning = False

    return result


def _expected_pairwise_diff_loo(x, x2, log_lik, rng, r_eff=1.0, **kwargs):
    """E|X - X'| per observation under the joint two-sample LOO weights."""
    S = x.sizes["__sample__"]
    shuffle = rng.permutation(S)
    x2_shuffled = x2.isel(__sample__=shuffle)
    log_lik2_shuffled = log_lik.isel(__sample__=shuffle)

    joint_log_lik = DataArray(
        -log_lik.values - log_lik2_shuffled.values,
        log_lik.dims,
        dict(log_lik.coords),
    )
    log_weights, _ = psislw(joint_log_lik, reff=r_eff)
    abs_diff = DataArray(
        np.abs(x.values - x2_shuffled.values), x.dims, dict(x.coords)
    )
    return e_loo(
        abs_diff, log_weights=log_weights, log_ratios=joint_log_lik, **kwargs
    ).value


def _crps(EXX, EXy, scale: bool = False):
    """crps = 0.5*EXX - EXy; scrps = -EXy/EXX - 0.5 log EXX."""
    if scale:
        return -EXy / EXX - 0.5 * np.log(EXX)
    return 0.5 * EXX - EXy


def _validate_crps_input(x, x2, y, log_lik=None) -> None:
    """Shape/sanity validation mirroring reference loo_score.py:349-414."""
    if x.dims != x2.dims:
        raise ValueError("x and x2 must have the same dimensions")
    if x.shape != x2.shape:
        raise ValueError("x and x2 must have the same shape")
    if (
        np.isnan(x.values).any()
        or np.isnan(x2.values).any()
        or np.isnan(y.values).any()
    ):
        warnings.warn(
            "NaN values detected in input data. These may lead to unreliable results.",
            UserWarning,
            stacklevel=2,
        )
    if (
        np.isinf(x.values).any()
        or np.isinf(x2.values).any()
        or np.isinf(y.values).any()
    ):
        warnings.warn(
            "Infinite values detected in input data. These may lead to unreliable"
            " results.",
            UserWarning,
            stacklevel=2,
        )
    x_obs_dims = [d for d in x.dims if d != "__sample__"]
    if set(x_obs_dims) != set(y.dims):
        raise ValueError(
            f"y dimensions {list(y.dims)} are not compatible with x dimensions {x.dims}"
        )
    if log_lik is not None:
        if "__sample__" not in log_lik.dims:
            raise ValueError("log_lik must have '__sample__' dimension")
        ll_obs_dims = [d for d in log_lik.dims if d != "__sample__"]
        if set(ll_obs_dims) != set(x_obs_dims):
            raise ValueError(
                f"log_lik dimensions {log_lik.dims} are not compatible with x"
                f" dimensions {x.dims}"
            )


def _pick_var(group_ds, group_name, var, role):
    if var is None:
        names = list(group_ds.data_vars)
        if len(names) == 1:
            return names[0]
        raise ValueError(
            f"Multiple variables found in {group_name} group. Please specify"
            f" {role} from: {names}"
        )
    if var not in group_ds.data_vars:
        raise ValueError(
            f"Variable '{var}' not found in {group_name} group. Available"
            f" variables: {list(group_ds.data_vars)}"
        )
    return var


def _get_data(
    inference_data: InferenceData,
    x_group="posterior_predictive",
    x_var=None,
    x2_group=None,
    x2_var=None,
    y_group="observed_data",
    y_var=None,
    log_likelihood=None,
) -> Tuple[DataArray, DataArray, DataArray, DataArray | None]:
    """Resolve the x / x2 / y variables and stack sample dims."""
    if not hasattr(inference_data, x_group):
        raise ValueError(f"InferenceData object does not have a {x_group} group")
    x_ds = getattr(inference_data, x_group)
    x_var = _pick_var(x_ds, x_group, x_var, "x_var")
    x_data = x_ds[x_var]

    x2_group = x2_group or x_group
    if not hasattr(inference_data, x2_group):
        raise ValueError(f"InferenceData object does not have a {x2_group} group")
    x2_ds = getattr(inference_data, x2_group)
    x2_var = x2_var or x_var
    if x2_var not in x2_ds.data_vars:
        raise ValueError(
            f"Variable '{x2_var}' not found in {x2_group} group. Available"
            f" variables: {list(x2_ds.data_vars)}"
        )
    x2_data = x2_ds[x2_var]

    if not hasattr(inference_data, y_group):
        raise ValueError(f"InferenceData object does not have a {y_group} group")
    y_ds = getattr(inference_data, y_group)
    y_var = _pick_var(y_ds, y_group, y_var, "y_var")
    y_data = y_ds[y_var]

    if "chain" in x_data.dims and "draw" in x_data.dims:
        x_data = x_data.stack(__sample__=("chain", "draw"))
    if "chain" in x2_data.dims and "draw" in x2_data.dims:
        x2_data = x2_data.stack(__sample__=("chain", "draw"))
    if (
        log_likelihood is not None
        and "chain" in log_likelihood.dims
        and "draw" in log_likelihood.dims
    ):
        log_likelihood = log_likelihood.stack(__sample__=("chain", "draw"))
    return x_data, x2_data, y_data, log_likelihood


def crps(x, x2, y, *, scale: bool = False, permutations: int = 1,
         seed: int | None = None) -> LooScoreResult:
    """Posterior-sample CRPS from two independent predictive draw sets.

    The plain (non-leave-one-out) counterpart of :func:`loo_score`
    (R ``loo::crps`` / ``loo::scrps`` parity; the reference package only
    ships the LOO variant).  Per observation ``i``:

        EXX_i = mean_s |x_si - x2_si|      (E|X - X'|, X' independent)
        EXy_i = mean_s |x_si - y_i|        (E|X - y|)
        crps_i = 0.5 * EXX_i - EXy_i
        scrps_i = -EXy_i / EXX_i - 0.5 * log(EXX_i)     (``scale=True``)

    Parameters
    ----------
    x, x2 : array
        Independent predictive sample sets, shaped ``(S, *obs)`` or
        ``(chain, draw, *obs)`` (flattened to draws).  Must match.
    y : array
        Observed values shaped ``obs``.
    scale : bool
        ``True`` computes SCRPS (Bolin & Wallin 2023) instead of CRPS.
    permutations : int
        Extra random re-pairings of ``x2`` rows averaged into ``EXX`` to
        reduce its variance.  The first pairing is always the identity
        (the caller's ``x``/``x2`` pairing), so ``permutations=1`` is
        deterministic; each additional pairing shuffles with ``seed``.
    """
    x = np.asarray(x, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape != x2.shape:
        raise ValueError("x and x2 must have the same shape")
    if x.ndim == y.ndim + 2:  # (chain, draw, *obs) -> (S, *obs)
        x = x.reshape((-1,) + x.shape[2:])
        x2 = x2.reshape((-1,) + x2.shape[2:])
    if x.shape[1:] != y.shape:
        raise ValueError(
            f"x has observation shape {x.shape[1:]}, y has {y.shape}"
        )
    if permutations < 1:
        raise ValueError("permutations must be >= 1")
    S = x.shape[0]
    if np.isnan(x).any() or np.isnan(x2).any() or np.isnan(y).any():
        warnings.warn(
            "NaN values detected in input data. These may lead to unreliable"
            " results.",
            UserWarning,
            stacklevel=2,
        )

    EXX = np.abs(x - x2).mean(axis=0)
    if permutations > 1:
        rng = np.random.default_rng(seed)
        for _ in range(permutations - 1):
            EXX = EXX + np.abs(x - x2[rng.permutation(S)]).mean(axis=0)
        EXX = EXX / permutations
    EXy = np.abs(x - y[None]).mean(axis=0)

    score_pw = _crps(EXX, EXy, scale=scale)
    score_value = float(score_pw.mean())
    score_se = float(score_pw.std() / np.sqrt(score_pw.size))
    estimates = np.array(
        [(score_value, score_se)], dtype=[("Estimate", float), ("SE", float)]
    )[0]
    return LooScoreResult(estimates=estimates, pointwise=score_pw)


def scrps(x, x2, y, *, permutations: int = 1,
          seed: int | None = None) -> LooScoreResult:
    """Posterior-sample SCRPS (scaled CRPS); see :func:`crps`."""
    return crps(x, x2, y, scale=True, permutations=permutations, seed=seed)
