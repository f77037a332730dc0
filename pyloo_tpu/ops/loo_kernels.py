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
from .selection import topk_vals_desc
from .psis import (
    _gpdfit_batch,
    _log1mexp,
    psislw_batch,
    sislw_batch,
    tislw_batch,
)

__all__ = [
    "loo_scores_psis",
    "loo_scores_psis_fast",
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


@partial(jax.jit, static_argnames=("tail_max",))
def loo_scores_psis_fast(log_lik, tail_max: int):
    """Scatter-free PSIS-LOO scores over compact top-k arrays (fast path).

    Identity making this possible: with x = -ll - C (C the row max of -ll),
    every non-tail element satisfies x_smoothed + ll = -C exactly, so

        lse(x_s + ll) = -C + log((S - n_tail) + sum_tail exp(s_j - x_j))
        lse(x_s)      = log(sum_nontail exp(x) + sum_tail exp(s_j))

    and the elpd closes over the (B, M) compacted tail — no scatter back into
    the (B, S) array, no full sort.  Tail selection is the exact segmented
    cascade in ``selection.topk_vals_desc`` (~1.5x over single-stage
    ``approx_max_k`` on TPU); intended for the float32 throughput path.
    """
    x_raw = -log_lik
    B, S = x_raw.shape
    dtype = x_raw.dtype
    M = tail_max
    # reference cutoff floor: log of float64-tiny (psis.py:90); representable
    # as a float32 VALUE, and the log-domain fit never exponentiates it
    import numpy as _np

    cutoff_floor = jnp.asarray(
        float(_np.log(_np.finfo(_np.float64).tiny)), dtype
    )

    from .selection import _pallas_applicable

    use_fused = _pallas_applicable(x_raw, M + 1)
    if use_fused:
        # one VMEM visit computes the sorted tail AND every full-row
        # reduction (row max, non-tail mass, lppd logsumexp)
        from .pallas_topk import pallas_loo_prepass

        vals, C1, log_ntl, log_sum_ll = pallas_loo_prepass(x_raw, M + 1)
        C = C1[:, None]
    else:
        C = jnp.max(x_raw, axis=1, keepdims=True)
        x = x_raw - C
        vals = topk_vals_desc(x, M + 1)  # descending (B, M+1), exact
    xcutoff = jnp.maximum(vals[:, M], cutoff_floor)  # (B,)
    tail_vals = vals[:, :M]
    in_tail = tail_vals > xcutoff[:, None]
    n_tail = jnp.sum(in_tail.astype(jnp.int32), axis=1)
    nf = n_tail.astype(dtype)

    # everything stays in DESCENDING layout: the GPD fit takes masked sums
    # (order-free) plus two single-element order statistics, and the plotting
    # position of descending slot d is (n - d - 0.5)/n — no (B, M) gathers.
    slot = jnp.arange(M, dtype=jnp.int32)
    slot_valid = slot[None, :] < n_tail[:, None]
    gap = jnp.minimum(xcutoff[:, None] - tail_vals, 0.0)
    log_exceed = jnp.where(slot_valid, tail_vals + _log1mexp(gap), -jnp.inf)

    # ascending index q_idx maps to descending index n - 1 - q_idx
    q_idx = jnp.clip((n_tail + 2) // 4 - 1, 0, M - 1)
    q_desc = jnp.clip(n_tail - 1 - q_idx, 0, M - 1)
    log_quart = jnp.take_along_axis(log_exceed, q_desc[:, None], axis=1)[:, 0]
    log_last = log_exceed[:, 0]

    k, sign_sigma, log_sigma = _gpdfit_batch(
        log_exceed, n_tail, log_quart=log_quart, log_last=log_last
    )

    eps = jnp.finfo(dtype).eps
    probs = (nf[:, None] - slot.astype(dtype)[None, :] - 0.5) / jnp.where(
        nf == 0, 1.0, nf
    )[:, None]
    log1m_p = jnp.log1p(-jnp.where(slot_valid, probs, 0.5))
    u = -k[:, None] * log1m_p
    abs_u = jnp.abs(u)
    log_abs_expm1 = jnp.where(u >= 0, u, 0.0) + _log1mexp(-abs_u)
    log_q = jnp.where(
        jnp.abs(k)[:, None] < eps,
        jnp.log(-log1m_p),
        log_abs_expm1 - jnp.log(jnp.abs(k))[:, None],
    )
    smoothed = jnp.logaddexp(log_sigma[:, None] + log_q, xcutoff[:, None])
    smoothed = jnp.minimum(smoothed, 0.0)  # truncate weights at exp(0)

    # Throughput-path divergence from the reference: rows whose fit yields
    # sigma <= 0 (a float32 fit degeneracy; the same rows are clean in
    # float64) fall back to the UNSMOOTHED tail instead of the reference's
    # NaN poisoning (psis.py gpinv semantics, preserved by the exact
    # float64 path in psislw_batch).
    smooth_ok = (n_tail > 4) & jnp.isfinite(k) & (sign_sigma > 0)
    s_vals = jnp.where(smooth_ok[:, None], smoothed, tail_vals)

    # Row reductions, all in log domain.  Two pitfalls make the "obvious"
    # exp-space forms wrong (caught by TestFastPathAdversarial):
    #   * sum(exp(x)) - sum(exp(tail)) cancels catastrophically when the tail
    #     carries ~all of the exp mass (heavy-tail rows): the fp noise floor
    #     eps*sum replaces the true non-tail mass and shifts elpd by nats.
    #     The non-tail mass is summed directly under the x <= xcutoff mask
    #     (exactly complementary to the strict > tail membership).
    #   * exp(s - x) overflows float32 whenever the cutoff sits below
    #     ~-88, so the tail ratio sum runs as a max-shifted logsumexp.
    if not use_fused:
        nontail_mask = x <= xcutoff[:, None]
        m1 = jnp.max(jnp.where(nontail_mask, x, -jnp.inf), axis=1)
        m1s = jnp.where(jnp.isfinite(m1), m1, 0.0)
        log_ntl = m1s + jnp.log(
            jnp.sum(
                jnp.where(nontail_mask, jnp.exp(x - m1s[:, None]), 0.0),
                axis=1,
            )
        )
    lse_s = logsumexp(jnp.where(slot_valid, s_vals, -jnp.inf), axis=1)
    denom = jnp.logaddexp(log_ntl, lse_s)

    d = jnp.where(slot_valid, s_vals - tail_vals, -jnp.inf)
    dm = jnp.max(d, axis=1)
    dms = jnp.where(jnp.isfinite(dm), dm, 0.0)
    lse_d = dms + jnp.log(jnp.sum(jnp.exp(d - dms[:, None]), axis=1))
    numer = jnp.logaddexp(jnp.log(S - nf), lse_d)
    elpd_i = -C[:, 0] + numer - denom

    if use_fused:
        lppd_i = log_sum_ll - jnp.log(jnp.asarray(S, dtype))
    else:
        lppd_i = logsumexp(log_lik, axis=1, b_inv=S)
    khat = jnp.where(n_tail <= 4, jnp.inf, k)
    return elpd_i, khat, lppd_i


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
