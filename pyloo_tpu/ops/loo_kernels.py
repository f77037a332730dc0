"""Fused per-observation LOO score kernels.

One jitted program per method computes, from a raw log-likelihood block,
everything ``loo()`` needs per observation: the IS-weighted elpd, the
diagnostic, and the in-sample lppd.  This fuses what the reference computes
in three separate ufunc passes over the data (reference ``pyloo/loo.py:286-337``)
into a single read of the ``(n_obs, S)`` tensor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lse import logsumexp
from .psis import psislw_batch, sislw_batch, tislw_batch

__all__ = [
    "loo_scores_psis",
    "loo_scores_sis",
    "loo_scores_tis",
    "mixture_scores",
    "waic_scores",
]


@partial(jax.jit, static_argnames=("tail_max",))
def loo_scores_psis(log_lik, tail_max: int):
    """(B, S) log-lik -> (elpd_i, pareto_k, lppd_i), all (B,)."""
    S = log_lik.shape[1]
    lw, k = psislw_batch(-log_lik, tail_max)
    elpd_i = logsumexp(lw + log_lik, axis=1)
    lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    return elpd_i, k, lppd_i


@jax.jit
def loo_scores_sis(log_lik):
    S = log_lik.shape[1]
    lw, ess = sislw_batch(-log_lik)
    elpd_i = logsumexp(lw + log_lik, axis=1)
    lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    return elpd_i, ess, lppd_i


@jax.jit
def loo_scores_tis(log_lik):
    S = log_lik.shape[1]
    lw, ess = tislw_batch(-log_lik)
    elpd_i = logsumexp(lw + log_lik, axis=1)
    lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    return elpd_i, ess, lppd_i


@jax.jit
def mixture_scores(log_lik):
    """Mix-IS-LOO elpd per observation (Silva & Zanella 2022, App. A.2).

    Reference ``pyloo/loo.py:252-284``: with per-observation mixture constant
    c_i = logsumexp_s(-ll_is), elpd_i = logsumexp_i(-c_i) -
    logsumexp_s(-ll_is - c_i).
    """
    S = log_lik.shape[1]
    c = logsumexp(-log_lik, axis=1)  # per observation, (B,)
    log_norm = logsumexp(-c, axis=0)  # global over observations
    log_obs = logsumexp(-log_lik - c[:, None], axis=1)
    elpd_i = log_norm - log_obs
    lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    return elpd_i, lppd_i


@jax.jit
def waic_scores(log_lik):
    """(B, S) log-lik -> (lppd_i, p_waic_i) for WAIC (reference waic.py:137-146).

    The reference takes the population variance over draws (xarray ``var``
    default ddof=0).
    """
    S = log_lik.shape[1]
    lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    p_waic_i = jnp.var(log_lik, axis=1, ddof=0)
    return lppd_i, p_waic_i
