"""Implicitly-adaptive importance sampling via moment matching.

Capability-equivalent to reference ``pyloo/loo_moment_match.py:34-1157``
(Paananen, Piironen, Bürkner, Vehtari 2021, "Implicitly adaptive importance
sampling", Stat. Comput. 31).  For every observation whose Pareto k exceeds
the threshold, posterior draws are affinely transformed (weighted-mean shift,
+marginal-scale, +covariance via Cholesky) and kept greedily whenever the
transform lowers k; an optional split transform (half forward, half inverse,
multiple-importance-sampling weights) protects the elpd estimate.

Two model interfaces, as in the reference:
* a :class:`pyloo_tpu.models.JAXModelWrapper` — log-prob/log-lik
  re-evaluations are jitted vmapped calls over the whole draw matrix;
* five user callables (``post_draws``, ``log_lik_i``, ``unconstrain_pars``,
  ``log_prob_upars_fn``, ``log_lik_i_upars_fn``) with the reference
  signatures.
"""

from __future__ import annotations

import inspect
import logging
import warnings
from copy import deepcopy
from typing import Any, Callable, Literal

import numpy as np

from .base import ISMethod, compute_importance_weights
from .containers import DataArray
from .elpd import ELPDData
from .helpers import (
    ParameterConverter,
    ShiftAndCovResult,
    ShiftAndScaleResult,
    ShiftResult,
    UpdateQuantitiesResult,
    compute_updated_r_eff,
    extract_log_likelihood_for_observation,
    log_lik_i_upars,
    log_prob_upars,
)
from .models.wrapper import JAXModelWrapper
from .ops.ess import ess_mean
from .split_moment_match import loo_moment_match_split
from .utils import _logsumexp

_log = logging.getLogger(__name__)

__all__ = ["loo_moment_match", "loo_moment_match_split"]


def loo_moment_match(
    model,
    loo_data: ELPDData,
    post_draws: Callable | None = None,
    log_lik_i: Callable | None = None,
    unconstrain_pars: Callable | None = None,
    log_prob_upars_fn: Callable | None = None,
    log_lik_i_upars_fn: Callable | None = None,
    max_iters: int = 30,
    k_threshold: float | None = None,
    split: bool = False,
    cov: bool = True,
    method: Literal["psis", "sis", "tis"] | ISMethod = "psis",
    verbose: bool = False,
    device_batched: bool | None = None,
    **kwargs,
) -> ELPDData:
    """Improve PSIS-LOO for high-k observations by moment matching.

    Parameters
    ----------
    model : JAXModelWrapper or custom object
        With a wrapper, draws/log-prob/log-lik come from the wrapper; with a
        custom object the five callables must be supplied.
    loo_data : ELPDData
        Pointwise LOO result to improve (must contain ``pareto_k``).
    max_iters : int
        Greedy transformation iterations per observation.
    k_threshold : float, optional
        Defaults to ``min(1 - 1/log10(S), 0.7)``.
    split : bool
        Apply the split transform (half forward / half inverse) after
        matching, protecting against transform overshoot.
    cov : bool
        Include the full-covariance (Cholesky) transform.
    device_batched : bool, optional
        Run the greedy loop for ALL bad observations as one vmapped
        ``lax.while_loop`` device program (:mod:`pyloo_tpu.ops.moment_match`)
        instead of a host loop with per-transform device round-trips.
        Default: automatically enabled on the wrapper + PSIS + non-verbose
        path; the five-callable interface always uses the host loop (the
        callbacks are arbitrary Python).

    Returns
    -------
    ELPDData
        Copy with updated ``loo_i``, ``pareto_k``, and totals.
    """
    _log.setLevel(logging.INFO if verbose else logging.WARNING)
    loo_data = deepcopy(loo_data)

    if hasattr(loo_data, "loo_i") and not hasattr(loo_data, "p_loo_i"):
        loo_data.p_loo_i = DataArray(
            np.zeros_like(loo_data.loo_i.values),
            loo_data.loo_i.dims,
            dict(loo_data.loo_i.coords),
        )

    is_wrapper = isinstance(model, JAXModelWrapper)
    if device_batched and not is_wrapper:
        raise ValueError(
            "device_batched=True requires a JAXModelWrapper model; the"
            " five-callable interface runs on the host loop."
        )
    converter = None
    if is_wrapper:
        converter = ParameterConverter(model)
        upars = model.get_unconstrained_parameters()
        S = upars.shape[0]
        orig_log_prob = log_prob_upars(model, upars)
    else:
        required = {
            "post_draws": post_draws,
            "log_lik_i": log_lik_i,
            "unconstrain_pars": unconstrain_pars,
            "log_prob_upars_fn": log_prob_upars_fn,
            "log_lik_i_upars_fn": log_lik_i_upars_fn,
        }
        missing = [name for name, fn in required.items() if fn is None]
        if missing:
            raise ValueError(
                "When not using JAXModelWrapper, you must provide all the"
                f" following functions: {', '.join(required)}. Missing:"
                f" {', '.join(missing)}"
            )
        _validate_custom_function(post_draws, ["model"], "post_draws")
        _validate_custom_function(log_lik_i, ["model", "i"], "log_lik_i")
        _validate_custom_function(
            unconstrain_pars, ["model", "pars"], "unconstrain_pars"
        )
        _validate_custom_function(
            log_prob_upars_fn, ["model", "upars"], "log_prob_upars_fn"
        )
        _validate_custom_function(
            log_lik_i_upars_fn, ["model", "upars", "i"], "log_lik_i_upars_fn"
        )
        try:
            pars = post_draws(model, **kwargs)
            upars = unconstrain_pars(model, pars=pars, **kwargs)
            upars = _validate_output(upars, "upars", expected_ndim=2)
        except Exception as e:
            raise ValueError(
                f"Error getting unconstrained parameters: {e}. Make sure your "
                "post_draws and unconstrain_pars functions are implemented"
                " correctly."
            ) from e
        S = upars.shape[0]
        try:
            orig_log_prob = log_prob_upars_fn(model, upars=upars, **kwargs)
            orig_log_prob = _validate_output(
                orig_log_prob, "orig_log_prob", expected_ndim=1
            )
        except Exception as e:
            raise ValueError(
                f"Error computing log probabilities: {e}. Make sure your "
                "log_prob_upars_fn function is implemented correctly."
            ) from e

    if k_threshold is None:
        k_threshold = min(1 - 1 / np.log10(S), 0.7)

    if hasattr(loo_data, "pareto_k"):
        ks = np.asarray(
            loo_data.pareto_k.values
            if hasattr(loo_data.pareto_k, "values")
            else loo_data.pareto_k
        )
    else:
        raise ValueError(
            "Moment matching requires pointwise LOO results with Pareto k values. "
            "Please recompute LOO with pointwise=True before using"
            " moment_match=True."
        )

    bad_obs = np.where(ks > k_threshold)[0]
    _log.info(f"Found {len(bad_obs)} observations with Pareto k > {k_threshold}")
    kfs = np.zeros_like(ks, dtype=float)
    original_ks = ks.copy()

    try:
        method_enum = method if isinstance(method, ISMethod) else ISMethod(
            str(method).lower()
        )
    except ValueError:
        method_enum = None
    if device_batched is None:
        device_batched = (
            is_wrapper and method_enum == ISMethod.PSIS and not verbose
        )
    if device_batched and method_enum == ISMethod.PSIS and len(bad_obs) > 0:
        _moment_match_wrapper_batched(
            model, loo_data, upars, orig_log_prob, bad_obs, kfs, ks,
            k_threshold=k_threshold, max_iters=max_iters, split=split,
            cov=cov, verbose=verbose,
        )
        summary(loo_data, original_ks, k_threshold, verbose=verbose)
        return loo_data

    for i in bad_obs:
        uparsi = upars.copy()
        ki = ks[i]
        kfi = 0.0

        log_liki, r_eff_i = _initial_log_lik(
            model, i, is_wrapper, upars, log_lik_i, verbose, **kwargs
        )
        lwi, initial_k = compute_importance_weights(
            -log_liki, method=method, reff=r_eff_i
        )
        lwi = np.asarray(lwi)

        total_shift = np.zeros(upars.shape[1])
        total_scaling = np.ones(upars.shape[1])
        total_mapping = np.eye(upars.shape[1])
        iterind = 1

        while iterind <= max_iters and ki > k_threshold:
            if iterind == max_iters:
                warnings.warn(
                    "Maximum number of moment matching iterations reached. "
                    "Increasing max_iters may improve accuracy.",
                    stacklevel=2,
                )
            improved = False

            transform_fns = [("shift", shift), ("scale", shift_and_scale)]
            if cov:
                transform_fns.append(("cov", shift_and_cov))

            # each transform is computed from the *current* (possibly just
            # accepted) draws, matching the reference's greedy sequencing
            for kind, make_trans in transform_fns:
                trans = make_trans(uparsi, lwi)
                try:
                    quantities = update_quantities_i(
                        model,
                        trans["upars"],
                        i,
                        orig_log_prob,
                        r_eff_i,
                        converter if is_wrapper else None,
                        None if is_wrapper else log_prob_upars_fn,
                        None if is_wrapper else log_lik_i_upars_fn,
                        method,
                        verbose=verbose,
                        **kwargs,
                    )
                except Exception as e:
                    warnings.warn(
                        f"Error during {kind} shift for observation {i}: {e}. "
                        "Skipping this transformation.",
                        stacklevel=2,
                    )
                    continue
                if quantities["ki"] < ki:
                    _log.info(
                        f"Observation {i}: {kind} transform improved Pareto k from"
                        f" {ki:.4f} to {quantities['ki']:.4f}"
                    )
                    uparsi = trans["upars"]
                    total_shift = total_shift + trans["shift"]
                    if "scaling" in trans:
                        total_scaling = total_scaling * trans["scaling"]
                    if "mapping" in trans:
                        total_mapping = trans["mapping"] @ total_mapping
                    lwi = np.asarray(quantities["lwi"])
                    ki = quantities["ki"]
                    kfi = quantities["kfi"]
                    log_liki = quantities["log_liki"]
                    iterind += 1
                    improved = True

            if not improved:
                _log.info(
                    f"Observation {i}: No further improvement after"
                    f" {iterind - 1} iterations. Final Pareto k = {ki:.4f}"
                )
                break

        if max_iters == 1:
            warnings.warn(
                "Maximum number of moment matching iterations reached with"
                " max_iters=1. Increasing max_iters may improve accuracy.",
                stacklevel=2,
            )

        if split and iterind > 1:
            try:
                split_result = loo_moment_match_split(
                    model,
                    upars,
                    cov,
                    total_shift,
                    total_scaling,
                    total_mapping,
                    i,
                    r_eff_i,
                    log_prob_upars_fn=None if is_wrapper else log_prob_upars_fn,
                    log_lik_i_upars_fn=None if is_wrapper else log_lik_i_upars_fn,
                    method=method,
                    verbose=verbose,
                    **kwargs,
                )
                log_liki = split_result["log_liki"]
                lwi = np.asarray(split_result["lwi"])
                r_eff_i = split_result["r_eff_i"]
            except Exception as e:
                warnings.warn(
                    f"Split transformation failed for observation {i}: {e}. "
                    "Using the last successful transformation instead.",
                    stacklevel=2,
                )

        new_elpd_i = float(_logsumexp(np.asarray(log_liki) + lwi))
        update_loo_data_i(
            loo_data, int(i), new_elpd_i, float(ki), float(kfi), kfs,
            log_liki=np.asarray(log_liki), verbose=verbose,
        )

    summary(loo_data, original_ks, k_threshold, verbose=verbose)
    return loo_data


# Traceable model closures per wrapper, cached WEAKLY so repeated
# loo_moment_match calls on the same wrapper reuse one compiled device
# program (the closures are jit static args: a fresh pair per call would
# recompile the whole batched while-loop every time).
_MM_FNS_CACHE: "weakref.WeakKeyDictionary" = None  # created lazily


def _wrapper_model_fns(wrapper):
    global _MM_FNS_CACHE
    import weakref

    import jax

    if _MM_FNS_CACHE is None:
        _MM_FNS_CACHE = weakref.WeakKeyDictionary()
    fns = _MM_FNS_CACHE.get(wrapper)
    if fns is not None:
        return fns
    w_ref = weakref.ref(wrapper)

    def log_prob_fn(u):
        return jax.vmap(lambda q: w_ref().model.logp_flat(q))(u)

    def log_lik_col_fn(u, i):
        return jax.vmap(lambda q: w_ref().model.log_lik_flat(q)[i])(u)

    fns = (log_prob_fn, log_lik_col_fn)
    try:
        _MM_FNS_CACHE[wrapper] = fns
    except TypeError:
        pass
    return fns


def _moment_match_wrapper_batched(
    model, loo_data, upars, orig_log_prob, bad_obs, kfs, ks, *,
    k_threshold, max_iters, split, cov, verbose,
):
    """Device-resident moment matching for every bad observation at once.

    SURVEY §7 Phase 5 realization: groups the bad-observation set by its
    integer PSIS tail length (a static shape), then launches ONE jitted
    program per group — transforms as batched (n_bad, S, P) linear algebra,
    PSIS re-fits through the batched kernel, greedy control flow as a
    vmapped ``lax.while_loop`` (:func:`pyloo_tpu.ops.moment_match.batched_moment_match`).
    The host loop above remains the path for custom callables / SIS / TIS.
    """
    import jax
    import jax.numpy as jnp

    from .ops import tail_length
    from .ops.moment_match import batched_moment_match
    from .ops.psis import psislw_batch

    upars = np.asarray(upars, dtype=np.float64)
    S, P = upars.shape
    log_prob_fn, log_lik_col_fn = _wrapper_model_fns(model)

    # one full pointwise evaluation at the original draws covers every
    # bad observation's initial log-lik
    ll_all = np.asarray(
        jax.jit(jax.vmap(model.model.log_lik_flat))(jnp.asarray(upars))
    )  # (S, n_obs_flat)

    # r_eff per bad observation, exactly as the host loop computes it
    posterior = getattr(model.idata, "posterior", None)
    n_chains = 1
    if posterior is not None:
        first = next(iter(posterior.data_vars.values()))
        n_chains = first.sizes.get("chain", 1)
    r_effs = {}
    for i in bad_obs:
        col = ll_all[:, int(i)]
        if n_chains == 1:
            r_effs[int(i)] = 1.0
        else:
            r_effs[int(i)] = float(
                np.asarray(ess_mean(col.reshape(n_chains, -1))) / S
            )

    # group by the (static) tail length so each group shares one program
    groups: dict[int, list[int]] = {}
    for i in bad_obs:
        m_i = tail_length(S, r_effs[int(i)])
        groups.setdefault(m_i, []).append(int(i))

    upars_dev = jnp.asarray(upars)
    orig_lp_dev = jnp.asarray(np.asarray(orig_log_prob, dtype=np.float64))

    # shard the bad-observation axis across the mesh: every lane of the
    # vmapped while_loop is independent, so the greedy loops for different
    # observations run on different chips (lanes that finish early coast
    # until the global condition clears)
    from .parallel import obs_mesh
    from .rcparams import rcParams as _rc

    mesh = obs_mesh() if _rc["device.auto_shard"] else None
    n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))

    for m_tail, idxs in groups.items():
        n_g = len(idxs)
        pad = (-n_g) % n_dev
        # padding lanes replay observation idxs[0] but start with ki at
        # -inf, so their while condition is false from the start
        idxs_p = idxs + [idxs[0]] * pad
        log_liki0 = jnp.asarray(ll_all[:, idxs_p].T)  # (n_bad_g+pad, S)
        lwi0, _ki_recomputed = psislw_batch(-log_liki0, m_tail)
        # host-loop parity: the greedy baseline k is the STORED pareto_k
        # from loo_data (reference loo_moment_match.py:389 ``ki = ks[i]``),
        # not the value recomputed from the initial weights
        ki0_np = np.asarray(ks, dtype=np.float64).flat[idxs_p].copy()
        if pad:
            ki0_np[n_g:] = -np.inf
        ki0 = jnp.asarray(ki0_np)
        obs_idx = jnp.asarray(np.asarray(idxs_p), jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            lane = NamedSharding(mesh, P("obs"))
            lane2d = NamedSharding(mesh, P("obs", None))
            obs_idx = jax.device_put(obs_idx, lane)
            log_liki0 = jax.device_put(log_liki0, lane2d)
            lwi0 = jax.device_put(lwi0, lane2d)
            ki0 = jax.device_put(ki0, lane)
        out = batched_moment_match(
            upars_dev,
            obs_idx,
            orig_lp_dev,
            log_liki0,
            lwi0,
            ki0,
            jnp.asarray(k_threshold, jnp.float64),
            log_prob_fn=log_prob_fn,
            log_lik_col_fn=log_lik_col_fn,
            tail_max=m_tail,
            max_iters=max_iters,
            use_cov=cov,
        )
        out = {k: np.asarray(v)[:n_g] for k, v in jax.device_get(out).items()}
        _log.info(
            f"Batched moment matching: group tail={m_tail} covered"
            f" {len(idxs)} observations,"
            f" {int(np.sum(out['n_accepted'] > 0))} improved"
        )

        for j, i in enumerate(idxs):
            ki = float(out["ki"][j])
            kfi = float(out["kfi"][j])
            lwi = out["lwi"][j]
            log_liki = out["log_liki"][j]
            r_eff_i = r_effs[i]
            n_accepted = int(out["n_accepted"][j])

            if bool(out["reached_max"][j]):
                warnings.warn(
                    "Maximum number of moment matching iterations reached. "
                    "Increasing max_iters may improve accuracy.",
                    stacklevel=2,
                )
            if max_iters == 1:
                warnings.warn(
                    "Maximum number of moment matching iterations reached with"
                    " max_iters=1. Increasing max_iters may improve accuracy.",
                    stacklevel=2,
                )

            if split and n_accepted > 0:
                try:
                    split_result = loo_moment_match_split(
                        model,
                        upars,
                        cov,
                        out["total_shift"][j],
                        out["total_scaling"][j],
                        out["total_mapping"][j],
                        i,
                        r_eff_i,
                        method=ISMethod.PSIS,
                        verbose=verbose,
                    )
                    log_liki = np.asarray(split_result["log_liki"])
                    lwi = np.asarray(split_result["lwi"])
                    r_eff_i = split_result["r_eff_i"]
                except Exception as e:
                    warnings.warn(
                        f"Split transformation failed for observation {i}: {e}. "
                        "Using the last successful transformation instead.",
                        stacklevel=2,
                    )

            new_elpd_i = float(_logsumexp(np.asarray(log_liki) + lwi))
            update_loo_data_i(
                loo_data, int(i), new_elpd_i, ki, kfi, kfs,
                log_liki=np.asarray(log_liki), verbose=verbose,
            )


def _initial_log_lik(model, i, is_wrapper, upars, log_lik_i, verbose, **kwargs):
    """Original-draw log-lik for observation i and its relative efficiency."""
    if is_wrapper:
        ll = log_lik_i_upars(model, upars, pointwise=True)
        log_liki = extract_log_likelihood_for_observation(ll, int(i))
        posterior = getattr(model.idata, "posterior", None)
        n_chains = 1
        if posterior is not None:
            first = next(iter(posterior.data_vars.values()))
            n_chains = first.sizes.get("chain", 1)
        if n_chains == 1:
            r_eff_i = 1.0
        else:
            arranged = log_liki.reshape(n_chains, -1)
            r_eff_i = float(np.asarray(ess_mean(arranged)) / len(log_liki))
        return log_liki, r_eff_i

    try:
        log_liki = log_lik_i(model, i, **kwargs)
        log_liki = _validate_output(
            log_liki, f"log_lik for observation {i}", expected_ndim=1
        )
    except Exception as e:
        raise ValueError(
            f"Error computing log likelihood for observation {i}: {e}. "
            "Make sure your log_lik_i function returns the log likelihood "
            "for the specified observation as a 1D array."
        ) from e
    matrix = np.asarray(log_liki)
    if matrix.ndim > 1 and matrix.shape[1] > 1:
        r_eff_i = float(np.asarray(ess_mean(matrix.T)) / matrix.size)
    else:
        r_eff_i = 1.0
    return log_liki, r_eff_i


def update_quantities_i(
    model,
    upars: np.ndarray,
    i: int,
    orig_log_prob: np.ndarray,
    r_eff_i: float,
    converter: ParameterConverter | None = None,
    log_prob_upars_fn: Callable | None = None,
    log_lik_i_upars_fn: Callable | None = None,
    method: Literal["psis", "sis", "tis"] | ISMethod = "psis",
    verbose: bool = False,
    **kwargs,
) -> UpdateQuantitiesResult:
    """Re-evaluate weights/diagnostics/log-lik at transformed draws.

    Importance ratios: ``lr = -log_lik_new + log_prob_new - orig_log_prob``
    (leave-one-out) and ``log_prob_new - orig_log_prob`` (full posterior),
    each re-smoothed with the chosen IS method.
    """
    if isinstance(model, JAXModelWrapper):
        log_prob_new = log_prob_upars(model, upars)
        ll = log_lik_i_upars(model, upars, pointwise=True)
        log_liki_new = extract_log_likelihood_for_observation(ll, i)
    else:
        if None in (log_prob_upars_fn, log_lik_i_upars_fn):
            raise ValueError(
                "log_prob_upars_fn and log_lik_i_upars_fn must be provided when"
                " not using JAXModelWrapper"
            )
        try:
            log_prob_new = log_prob_upars_fn(model, upars=upars, **kwargs)
            log_prob_new = _validate_output(
                log_prob_new, "log_prob_new", expected_ndim=1
            )
        except Exception as e:
            raise ValueError(
                f"Error computing log probability: {e}. Make sure your"
                " log_prob_upars_fn function returns a 1D array of log"
                " probabilities."
            ) from e
        try:
            log_liki_new = log_lik_i_upars_fn(model, upars=upars, i=i, **kwargs)
            log_liki_new = _validate_output(
                log_liki_new, f"log_liki_new for obs {i}", expected_ndim=1
            )
        except Exception as e:
            raise ValueError(
                f"Error computing log likelihood for observation {i}: {e}. Make"
                " sure your log_lik_i_upars_fn function returns a 1D array of"
                " log likelihoods."
            ) from e

    log_liki_new = np.asarray(log_liki_new, dtype=np.float64)
    log_prob_new = np.asarray(log_prob_new, dtype=np.float64)
    orig_log_prob = np.asarray(orig_log_prob, dtype=np.float64)

    lr = -log_liki_new + log_prob_new - orig_log_prob
    lr[np.isnan(lr)] = -np.inf
    lwi_new, ki_new = compute_importance_weights(lr, method=method, reff=r_eff_i)

    full_lr = log_prob_new - orig_log_prob
    full_lr[np.isnan(full_lr)] = -np.inf
    lwfi_new, kfi_new = compute_importance_weights(
        full_lr, method=method, reff=r_eff_i
    )

    return {
        "lwi": np.asarray(lwi_new),
        "lwfi": np.asarray(lwfi_new),
        "ki": float(ki_new),
        "kfi": float(kfi_new),
        "log_liki": log_liki_new,
    }


def shift(upars: np.ndarray, lwi: np.ndarray) -> ShiftResult:
    """Translate draws so the plain mean lands on the weighted mean."""
    mean_original = np.mean(upars, axis=0)
    mean_weighted = np.sum(np.exp(lwi)[:, None] * upars, axis=0)
    shift_amt = mean_weighted - mean_original
    return {"upars": upars + shift_amt[None, :], "shift": shift_amt}


def shift_and_scale(upars: np.ndarray, lwi: np.ndarray) -> ShiftAndScaleResult:
    """Shift plus marginal-variance matching (S/(S-1)-corrected 2nd moment)."""
    S = upars.shape[0]
    mean_original = np.mean(upars, axis=0)
    mean_weighted = np.sum(np.exp(lwi)[:, None] * upars, axis=0)
    shift_amt = mean_weighted - mean_original
    mii = np.sum(np.exp(lwi)[:, None] * upars**2, axis=0) - mean_weighted**2
    mii = mii * S / (S - 1)
    scaling = np.sqrt(mii / np.var(upars, axis=0))
    upars_new = (upars - mean_original[None, :]) * scaling[None, :] + mean_weighted[
        None, :
    ]
    return {"upars": upars_new, "shift": shift_amt, "scaling": scaling}


def shift_and_cov(upars: np.ndarray, lwi: np.ndarray) -> ShiftAndCovResult:
    """Shift plus full covariance matching via the Cholesky map L_w @ L^-1.

    With lower-triangular factors cov = L L^T and wcov = L_w L_w^T, the map
    M = L_w L^-1 satisfies M cov M^T = wcov exactly.  (R loo's ``chol`` is
    upper-triangular; the reference translated its transpose pattern onto
    NumPy's lower factor, ``loo_moment_match.py:899-901``, producing a map
    that does not actually reproduce the weighted covariance.)
    """
    mean_original = np.mean(upars, axis=0)
    mean_weighted = np.sum(np.exp(lwi)[:, None] * upars, axis=0)
    shift_amt = mean_weighted - mean_original

    covv = np.atleast_2d(np.cov(upars, rowvar=False))
    wcovv = np.atleast_2d(np.cov(upars, rowvar=False, aweights=np.exp(lwi)))
    try:
        chol1 = np.linalg.cholesky(wcovv)
        chol2 = np.linalg.cholesky(covv)
        mapping = chol1 @ np.linalg.inv(chol2)
    except np.linalg.LinAlgError as e:
        warnings.warn(
            f"Cholesky decomposition failed during covariance matching: {e}. "
            "Using identity mapping instead.",
            stacklevel=2,
        )
        mapping = np.eye(len(mean_original))

    upars_new = (upars - mean_original[None, :]) @ mapping.T + mean_weighted[None, :]
    return {"upars": upars_new, "shift": shift_amt, "mapping": mapping}


def update_loo_data_i(
    loo_data: ELPDData,
    i: int,
    new_elpd_i: float,
    ki: float,
    kfi: float,
    kfs: np.ndarray,
    wrapper=None,
    log_liki: np.ndarray | None = None,
    verbose: bool = False,
) -> None:
    """Write observation i's improved elpd/k back and re-derive the totals."""
    if log_liki is None:
        raise ValueError("log_liki must be provided")
    lpd_i = _logsumexp(log_liki) - np.log(len(log_liki))
    p_loo_i = lpd_i - new_elpd_i

    if hasattr(loo_data, "loo_i"):
        old_elpd_i = loo_data.loo_i.values.flat[i]
        loo_data.loo_i.values.flat[i] = new_elpd_i
        loo_data.p_loo_i.values.flat[i] = p_loo_i
        loo_data["elpd_loo"] = float(np.sum(loo_data.loo_i.values))
        loo_data["p_loo"] = float(np.sum(loo_data.p_loo_i.values))
        n_data_points = loo_data.n_data_points
        loo_data["se"] = float(
            (n_data_points * np.var(loo_data.loo_i.values)) ** 0.5
        )
        loo_data["p_loo_se"] = float(
            (n_data_points * np.var(loo_data.p_loo_i.values)) ** 0.5
        )
        _log.info(
            f"Observation {i}: ELPD changed from {old_elpd_i:.4f} to"
            f" {new_elpd_i:.4f} (diff: {new_elpd_i - old_elpd_i:.4f})"
        )
    else:
        loo_data["elpd_loo"] = new_elpd_i
        loo_data["p_loo"] = p_loo_i

    if "looic" in loo_data:
        loo_data["looic"] = -2 * loo_data["elpd_loo"]
        if "se" in loo_data:
            loo_data["looic_se"] = 2 * loo_data["se"]

    if hasattr(loo_data, "pareto_k"):
        k_arr = (
            loo_data.pareto_k.values
            if hasattr(loo_data.pareto_k, "values")
            else loo_data.pareto_k
        )
        old_k = k_arr.flat[i]
        k_arr.flat[i] = ki
        _log.info(
            f"Observation {i}: Pareto k changed from {old_k:.4f} to {ki:.4f}"
            f" (improvement: {old_k - ki:.4f})"
        )
    kfs.flat[i] = kfi


def summary(loo_data, original_ks, k_threshold, verbose=False):
    """Log how many observations improved / remain problematic."""
    if not hasattr(loo_data, "pareto_k"):
        return
    new_ks = (
        loo_data.pareto_k.values
        if hasattr(loo_data.pareto_k, "values")
        else loo_data.pareto_k
    )
    was_bad = original_ks > k_threshold
    still_bad = np.asarray(new_ks) > k_threshold
    improved = int(np.sum(was_bad & ~still_bad))
    remaining = int(np.sum(still_bad))
    _log.info(
        f"Moment matching: {improved} of {int(np.sum(was_bad))} problematic"
        f" observations improved below the threshold; {remaining} remain above."
    )


def _validate_custom_function(func, required_args, name):
    """Check a user callable exposes the reference-contract arguments."""
    try:
        signature = inspect.signature(func)
    except (TypeError, ValueError):
        raise ValueError(f"{name} must be a callable function")
    params = set(signature.parameters)
    has_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD
        for p in signature.parameters.values()
    )
    missing = [a for a in required_args if a not in params]
    if missing and not has_var_kw:
        raise ValueError(
            f"Function {name} is missing required arguments: {', '.join(missing)}"
        )


def _validate_output(value, name, expected_ndim):
    """Coerce model-callback output to a float ndarray of the expected rank."""
    if isinstance(value, DataArray):
        value = value.values
    value = np.asarray(value, dtype=np.float64)
    if value.ndim > expected_ndim:
        value = value.reshape(value.shape[0], -1) if expected_ndim == 2 else value.ravel()
    if value.ndim != expected_ndim:
        raise ValueError(
            f"{name} must be a {expected_ndim}-D array, got shape {value.shape}"
        )
    if value.size == 0:
        raise ValueError(f"{name} is empty")
    return value
