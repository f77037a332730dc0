"""Model comparison: ranking, pairwise elpd differences, model weights.

Capability-equivalent to reference ``pyloo/compare.py:23-596``.  Weights:
stacking (scipy SLSQP for small problems — matching the reference optimum —
or the on-device EM solver for large pointwise matrices), Bayesian-bootstrap
pseudo-BMA (vectorized, no per-sample Python loop), and plain pseudo-BMA.
"""

from __future__ import annotations

import warnings
from copy import deepcopy
from typing import Literal

import numpy as np
import pandas as pd

from .elpd import ELPDData
from .loo import loo
from .waic import waic

__all__ = ["loo_compare", "loo_model_weights"]

# above this many observations the stacking solve moves on device
_DEVICE_SOLVER_MIN_OBS = 100_000


def loo_compare(
    compare_dict,
    ic: str = "loo",
    method: Literal["stacking", "bb-pseudo-bma", "pseudo-bma"] = "stacking",
    b_samples: int = 1000,
    alpha: float = 1,
    seed=None,
    scale: str | None = None,
    var_name: str | None = None,
    observations=None,
    estimator=None,
    K: int | None = None,
    folds=None,
    stratify=None,
    random_seed: int | None = None,
) -> pd.DataFrame:
    """Compare models by ELPD (LOO, WAIC, subsampled LOO, or K-fold CV).

    Returns a DataFrame ordered best-to-worst with columns rank / elpd /
    p_<ic> / elpd_diff / weight / se / dse / warning / scale.

    Examples
    --------
    .. code-block:: python

        import pyloo_tpu as pl

        df = pl.loo_compare({
            "centered": pl.load_example_data("centered_eight"),
            "non_centered": pl.load_example_data("non_centered_eight"),
        })
        df["weight"]             # stacking weights on the simplex
    """
    if not isinstance(compare_dict, dict):
        raise TypeError("compare_dict must be a dictionary")
    if len(compare_dict) < 2:
        raise ValueError("You must specify at least two models for comparison")

    if scale is None:
        scale = "log"
    scale = scale.lower()
    if scale not in ["log", "negative_log", "deviance"]:
        raise ValueError("Scale must be 'log', 'negative_log' or 'deviance'")

    method = method.lower()
    if method not in ["stacking", "bb-pseudo-bma", "pseudo-bma"]:
        raise ValueError("Method must be 'stacking', 'BB-pseudo-BMA' or 'pseudo-BMA'")
    if ic not in ["loo", "waic", "kfold"]:
        raise ValueError("ic must be 'loo', 'waic', or 'kfold'")

    elpds, scale, ic = _calculate_ics(
        compare_dict,
        scale=scale,
        ic=ic,
        var_name=var_name,
        observations=observations,
        estimator=estimator,
        K=K,
        folds=folds,
        stratify=stratify,
        random_seed=random_seed,
    )

    ascending = scale != "log"
    model_names = list(elpds.keys())
    elpd_values = np.array([elpds[name][f"elpd_{ic}"] for name in model_names])
    order = np.argsort(elpd_values) if ascending else np.argsort(-elpd_values)
    ordered_names = [model_names[i] for i in order]

    best_model = ordered_names[0]
    diffs, ses, dses = [], [], []
    for name in ordered_names:
        if name == best_model:
            diff = 0
            dse = 0
        else:
            diff = elpds[name][f"elpd_{ic}"] - elpds[best_model][f"elpd_{ic}"]
            if scale == "negative_log":
                diff *= -1
            elif scale == "deviance":
                diff *= -2
            ic_i = f"{ic}_i"
            pointwise_diff = (
                elpds[name][ic_i].values - elpds[best_model][ic_i].values
            )
            dse = np.sqrt(len(pointwise_diff) * np.var(pointwise_diff))
        diffs.append(diff)
        ses.append(elpds[name]["se"])
        dses.append(dse)

    if method == "stacking":
        weights = _stacking_weights(elpds, ic, scale)
    elif method == "bb-pseudo-bma":
        weights, computed_ses = _bb_pseudo_bma_weights(
            elpds, ic, b_samples, alpha, seed, scale
        )
        ses = [computed_ses[name] for name in ordered_names]
    else:
        weights = _pseudo_bma_weights(elpds, ic, scale)

    return pd.DataFrame(
        {
            "rank": range(len(ordered_names)),
            f"elpd_{ic}": [elpds[name][f"elpd_{ic}"] for name in ordered_names],
            # LFO results carry no effective-parameter estimate (p_lfo is
            # undefined without a matched in-sample lpd per fit)
            f"p_{ic}": [
                elpds[name].get(f"p_{ic}", np.nan) for name in ordered_names
            ],
            "elpd_diff": diffs,
            "weight": [weights[name] for name in ordered_names],
            "se": ses,
            "dse": dses,
            "warning": [elpds[name]["warning"] for name in ordered_names],
            "scale": scale,
        },
        index=ordered_names,
    )


def loo_model_weights(
    compare_dict,
    ic: str = "loo",
    method: Literal["stacking", "bb-pseudo-bma", "pseudo-bma"] = "stacking",
    b_samples: int = 1000,
    alpha: float = 1,
    seed=None,
    scale: str | None = None,
    var_name: str | None = None,
) -> pd.Series:
    """Model-averaging weights alone, without the comparison table.

    R ``loo::loo_model_weights`` parity (the reference package only exposes
    weights through :func:`loo_compare`'s DataFrame).  Accepts the same
    ``compare_dict`` of InferenceData-convertibles or precomputed
    :class:`~pyloo_tpu.elpd.ELPDData` results; returns a
    :class:`pandas.Series` of simplex weights indexed by model name, in the
    caller's insertion order (not ranked).
    """
    if not isinstance(compare_dict, dict):
        raise TypeError("compare_dict must be a dictionary")
    if len(compare_dict) < 2:
        raise ValueError("You must specify at least two models for comparison")
    if scale is None:
        scale = "log"
    scale = scale.lower()
    if scale not in ["log", "negative_log", "deviance"]:
        raise ValueError("Scale must be 'log', 'negative_log' or 'deviance'")
    method = method.lower()
    if method not in ["stacking", "bb-pseudo-bma", "pseudo-bma"]:
        raise ValueError("Method must be 'stacking', 'BB-pseudo-BMA' or 'pseudo-BMA'")
    if ic not in ["loo", "waic", "kfold"]:
        raise ValueError("ic must be 'loo', 'waic', or 'kfold'")

    elpds, scale, ic = _calculate_ics(
        compare_dict, scale=scale, ic=ic, var_name=var_name
    )
    if method == "stacking":
        weights = _stacking_weights(elpds, ic, scale)
    elif method == "bb-pseudo-bma":
        weights, _ = _bb_pseudo_bma_weights(
            elpds, ic, b_samples, alpha, seed, scale
        )
    else:
        weights = _pseudo_bma_weights(elpds, ic, scale)
    names = list(elpds.keys())
    return pd.Series([weights[n] for n in names], index=names, name="weight")


def _ic_matrix(elpds, ic_i):
    """Pointwise elpds as (n_obs, n_models); validates matching lengths.

    (Reference-compatible name, ``pyloo/compare.py:267-282``.)"""
    model_names = list(elpds.keys())
    columns = []
    rows = None
    for name in model_names:
        values = np.asarray(elpds[name][ic_i].values).ravel()
        if rows is None:
            rows = len(values)
        elif len(values) != rows:
            raise ValueError(
                "The number of observations should be the same across all models"
            )
        columns.append(values)
    return rows, len(model_names), np.stack(columns, axis=1)


def _calculate_ics(
    compare_dict,
    scale=None,
    ic=None,
    var_name=None,
    observations=None,
    estimator=None,
    K=None,
    folds=None,
    stratify=None,
    random_seed=None,
):
    """Resolve precomputed ELPDData entries and compute the rest."""
    precomputed = {
        name: e for name, e in compare_dict.items() if isinstance(e, ELPDData)
    }
    precomputed_ic = None
    precomputed_scale = None

    if precomputed:
        arbitrary = list(precomputed.values())[-1]
        precomputed_ic = arbitrary.index[0].split("_")[1]
        precomputed_scale = arbitrary["scale"]
        missing_pointwise = f"{precomputed_ic}_i" not in arbitrary

        others = list(precomputed.values())[:-1]
        if any(e.index[0].split("_")[1] != precomputed_ic for e in others):
            raise ValueError("All information criteria to be compared must be the same")
        if any(e["scale"] != precomputed_scale for e in others):
            raise ValueError(
                "All information criteria to be compared must use the same scale"
            )
        if missing_pointwise or any(
            f"{precomputed_ic}_i" not in e for e in others
        ):
            raise ValueError(
                "Not all provided ELPDData have been calculated with pointwise=True"
            )
        if ic is not None and ic.lower() != precomputed_ic.lower():
            warnings.warn(
                "Provided ic argument is incompatible with precomputed elpd data. "
                f"Using ic from precomputed elpddata: {precomputed_ic}",
                stacklevel=2,
            )
            ic = precomputed_ic
        if scale is not None and scale.lower() != precomputed_scale:
            warnings.warn(
                "Provided scale argument is incompatible with precomputed elpd data. "
                f"Using scale from precomputed elpddata: {precomputed_scale}",
                stacklevel=2,
            )
            scale = precomputed_scale

    ic = (precomputed_ic or "loo") if ic is None else ic.lower()
    scale = (precomputed_scale or "log") if scale is None else scale.lower()

    out = dict(deepcopy(compare_dict))
    if ic not in ("loo", "waic", "kfold") and any(
        not isinstance(d, ELPDData) for d in out.values()
    ):
        raise ValueError(
            f"ic='{ic}' cannot be computed from raw data inside loo_compare; "
            "precompute every entry (e.g. loo_lfo/loo_group with "
            "pointwise=True) and pass the ELPDData results"
        )
    for name, dataset in out.items():
        if isinstance(dataset, ELPDData):
            continue
        try:
            if ic == "waic":
                out[name] = waic(
                    dataset, pointwise=True, var_name=var_name, scale=scale
                )
            elif ic == "kfold":
                from .loo_kfold import loo_kfold

                out[name] = loo_kfold(
                    dataset,
                    K=K if K is not None else 10,
                    folds=folds,
                    pointwise=True,
                    var_name=var_name,
                    scale=scale,
                    stratify=stratify,
                    random_seed=random_seed,
                    save_fits=False,
                )
            elif observations is not None:
                from .loo_subsample import loo_subsample

                out[name] = loo_subsample(
                    dataset,
                    observations=observations,
                    estimator=estimator,
                    pointwise=True,
                    var_name=var_name,
                    scale=scale,
                )
            else:
                out[name] = loo(
                    dataset, pointwise=True, var_name=var_name, scale=scale
                )
        except Exception as e:
            raise e.__class__(
                f"Encountered error trying to compute {ic} from model {name}."
            ) from e
    return out, scale, ic


def _to_log_scale(values, scale):
    if scale == "deviance":
        return values / -2
    if scale == "negative_log":
        return values * -1
    return values


def _stacking_weights(elpds, ic, scale, solver="auto"):
    """Stacking of predictive distributions (Yao et al. 2018).

    ``solver="auto"`` uses scipy SLSQP (matching the reference optimizer) for
    small problems and the on-device EM solver
    (:func:`pyloo_tpu.ops.stacking.stacking_weights_em`) for large pointwise
    matrices.
    """
    model_names = list(elpds.keys())
    n_models = len(model_names)
    rows, _, pointwise = _ic_matrix(elpds, f"{ic}_i")
    pointwise = _to_log_scale(pointwise, scale)

    if solver == "device" or (solver == "auto" and rows >= _DEVICE_SOLVER_MIN_OBS):
        from .ops.stacking import stacking_weights_em

        weights = np.asarray(stacking_weights_em(pointwise))
        return dict(zip(model_names, weights))

    from scipy import optimize

    max_elpd = np.max(pointwise, axis=1, keepdims=True)
    exp_elpds = np.exp(pointwise - max_elpd)

    def full_simplex(free):
        w = np.concatenate((free, [max(1.0 - np.sum(free), 0.0)]))
        w = np.maximum(w, 0)
        return w / np.sum(w)

    def objective(free):
        return -np.sum(np.log(exp_elpds @ full_simplex(free)))

    def gradient(free):
        denom = exp_elpds @ full_simplex(free)
        return -np.array(
            [
                np.sum((exp_elpds[:, k] - exp_elpds[:, -1]) / denom)
                for k in range(n_models - 1)
            ]
        )

    result = optimize.minimize(
        objective,
        np.full(n_models - 1, 1.0 / n_models),
        jac=gradient,
        bounds=[(0.0, 1.0)] * (n_models - 1),
        constraints=[
            {"type": "ineq", "fun": lambda x: 1.0 - np.sum(x)},
            {"type": "ineq", "fun": np.sum},
        ],
        method="SLSQP",
        options={"ftol": 1e-12, "maxiter": 2000},
    )
    return dict(zip(model_names, full_simplex(result.x)))


def _bb_pseudo_bma_weights(elpds, ic, b_samples, alpha, seed, scale):
    """Bayesian-bootstrap pseudo-BMA: Dirichlet reweighting, vectorized."""
    model_names = list(elpds.keys())
    rows, cols, pointwise = _ic_matrix(elpds, f"{ic}_i")
    pointwise = _to_log_scale(pointwise * rows, scale)

    rng = (
        seed
        if isinstance(seed, np.random.RandomState)
        else np.random.RandomState(seed)
    )
    b_weighting = rng.dirichlet([alpha] * rows, size=b_samples)  # (b, rows)
    z_bs = b_weighting @ pointwise  # (b, cols) bootstrap elpd totals
    rel = z_bs - z_bs.max(axis=1, keepdims=True)
    w = np.exp(rel)
    w /= w.sum(axis=1, keepdims=True)
    mean_weights = w.mean(axis=0)
    ses = pd.Series(z_bs.std(axis=0), index=model_names)
    return dict(zip(model_names, mean_weights)), ses


def _pseudo_bma_weights(elpds, ic, scale):
    """Akaike-type weights: softmax of total elpds."""
    model_names = list(elpds.keys())
    totals = np.array([elpds[name][f"elpd_{ic}"] for name in model_names])
    totals = _to_log_scale(totals, scale)
    rel = totals - totals.max()
    w = np.exp(rel)
    return dict(zip(model_names, w / w.sum()))
