"""Batched weighted-expectation kernels (mean / variance / quantile / k-hat).

Device counterparts of reference ``pyloo/e_loo.py:429-559``, vectorized over
observations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lse import logsumexp
from .psis import _gpdfit_batch

__all__ = [
    "weighted_mean_batch",
    "weighted_variance_batch",
    "weighted_quantile_batch",
    "khat_batch",
]


def _normalize(lw):
    return lw - logsumexp(lw, axis=1, keepdims=True)


@jax.jit
def weighted_mean_batch(x, log_weights):
    """Row-wise importance-weighted mean: sum(w * x)."""
    w = jnp.exp(_normalize(log_weights))
    return jnp.sum(w * x, axis=1)


@jax.jit
def weighted_variance_batch(x, log_weights):
    """Unbiased weighted variance (E[x^2]-E[x]^2)/(1-sum(w^2)), clamped at 0.

    Degenerate rows (constant x, or a single dominant weight) return 0,
    mirroring reference ``_wvar_func`` (e_loo.py:518-531).
    """
    w = jnp.exp(_normalize(log_weights))
    mean = jnp.sum(w * x, axis=1)
    mean_sq = jnp.sum(w * x**2, axis=1)
    w_sum_sq = jnp.sum(w**2, axis=1)
    var = (mean_sq - mean**2) / (1.0 - w_sum_sq)
    var = jnp.maximum(var, 0.0)
    constant = jnp.all(jnp.isclose(x, x[:, :1]), axis=1)
    degenerate = jnp.isclose(w_sum_sq, 1.0)
    return jnp.where(constant | degenerate, 0.0, var)


@jax.jit
def weighted_quantile_batch(x, log_weights, probs):
    """Interpolated weighted quantiles per row.

    For each probability p: invert the cumulative weight function at p with
    linear interpolation between adjacent order statistics (reference
    ``_weighted_quantile``, e_loo.py:534-554).  Rows with (near-)constant
    weights use plain linear-interpolation quantiles, matching the
    reference's ``np.quantile`` fallback.  Returns (B, n_probs).
    """
    S = x.shape[1]
    w = jnp.exp(_normalize(log_weights))
    order = jnp.argsort(x, axis=1)
    xs = jnp.take_along_axis(x, order, axis=1)
    ws = jnp.take_along_axis(w, order, axis=1)
    cw = jnp.cumsum(ws, axis=1)
    cw = cw / cw[:, -1:]
    uniform_row = jnp.all(jnp.isclose(w, w[:, :1]), axis=1)

    def plain_quantile(p):
        # numpy's default linear interpolation at position (S-1)*p
        pos = (S - 1) * p
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, S - 1)
        hi = jnp.clip(lo + 1, 0, S - 1)
        frac = pos - lo
        x_lo = xs[:, lo]
        x_hi = xs[:, hi]
        return x_lo + frac * (x_hi - x_lo)

    def one_prob(p):
        # first index with cumweight >= p
        ge = cw >= p
        wi = jnp.argmax(ge, axis=1)
        any_ge = jnp.any(ge, axis=1)
        wi = jnp.where(any_ge, wi, xs.shape[1] - 1)
        x_hi = jnp.take_along_axis(xs, wi[:, None], axis=1)[:, 0]
        x_lo = jnp.take_along_axis(
            xs, jnp.maximum(wi - 1, 0)[:, None], axis=1
        )[:, 0]
        w_hi = jnp.take_along_axis(cw, wi[:, None], axis=1)[:, 0]
        w_lo = jnp.take_along_axis(
            cw, jnp.maximum(wi - 1, 0)[:, None], axis=1
        )[:, 0]
        interp = x_lo + (x_hi - x_lo) * (p - w_lo) / jnp.where(
            w_hi == w_lo, 1.0, w_hi - w_lo
        )
        weighted = jnp.where(
            wi == 0, xs[:, 0], jnp.where(any_ge, interp, xs[:, -1])
        )
        return jnp.where(uniform_row, plain_quantile(p), weighted)

    return jax.vmap(one_prob, out_axes=1)(jnp.asarray(probs))


def _tail_khat(values, tail_len):
    """GPD k of the top ``tail_len`` exceedances of each row of ``values``.

    Fits exceedances over the (tail_len+1)-th largest order statistic.  Note:
    the reference (e_loo.py:350-357) instead passes a *descending* tail whose
    last element is exactly zero into the fit, which makes the candidate grid
    infinite and collapses k to the constant prior value 5/(tail_len+10);
    this implementation computes the intended diagnostic.
    """
    B = values.shape[0]
    # with fewer draws than the nominal tail, use every draw above the row
    # minimum (the reference's ``sorted[:tail_len]`` slice semantics,
    # e_loo.py:352,371-372); rows left with < 5 positive exceedances still
    # return inf below
    tail_len = min(tail_len, values.shape[1] - 1)
    if tail_len < 1:
        return jnp.full((B,), jnp.inf, values.dtype)
    vals, _ = jax.lax.top_k(values, tail_len + 1)  # descending
    cutoff = vals[:, tail_len]
    tail = vals[:, :tail_len]
    exceed_desc = tail - cutoff[:, None]
    slot = jnp.arange(tail_len)
    asc = jnp.take_along_axis(
        exceed_desc, (tail_len - 1 - slot)[None, :] * jnp.ones((B, 1), jnp.int32),
        axis=1,
    )
    positive = asc > 0
    n = jnp.sum(positive.astype(jnp.int32), axis=1)
    # left-align the positive exceedances in log space
    # ascending order means zeros (ties with cutoff) come first; shift them out
    shift = tail_len - n  # number of leading non-positive slots
    src = jnp.clip(slot[None, :] + shift[:, None], 0, tail_len - 1)
    asc_valid = jnp.take_along_axis(asc, src, axis=1)
    log_exceed = jnp.where(
        slot[None, :] < n[:, None], jnp.log(jnp.maximum(asc_valid, 1e-300)), -jnp.inf
    )
    k, _, _ = _gpdfit_batch(log_exceed, n)
    constant = jnp.all(jnp.isclose(values, values[:, :1]), axis=1)
    return jnp.where((n < 5) | constant, jnp.inf, k)


@partial(jax.jit, static_argnames=("tail_len", "use_h"))
def khat_batch(h, log_ratios, tail_len: int = 20, use_h: bool = True):
    """Function-specific Pareto k diagnostic per row (e_loo.py:328-390).

    Fits the right tail of the raw importance ratios and, when ``use_h``,
    both tails of h*r; returns the max.
    """
    r = jnp.exp(log_ratios - jnp.max(log_ratios, axis=1, keepdims=True))
    khat_r = _tail_khat(r, tail_len)
    if not use_h:
        return khat_r

    hr = h * r
    k_right = _tail_khat(hr, tail_len)
    k_left = _tail_khat(-hr, tail_len)
    # reference semantics: one-sided failures contribute -inf, and rows where
    # h is degenerate (constant / two-valued / non-finite) fall back to khat_r
    khat_hr = jnp.maximum(
        jnp.where(jnp.isinf(k_right), -jnp.inf, k_right),
        jnp.where(jnp.isinf(k_left), -jnp.inf, k_left),
    )
    h_constant = jnp.all(jnp.isclose(h, h[:, :1]), axis=1)
    h_bad = h_constant | jnp.any(~jnp.isfinite(h), axis=1)
    both_nan = jnp.isnan(khat_hr) & jnp.isnan(khat_r)
    out = jnp.maximum(khat_hr, khat_r)
    out = jnp.where(h_bad, khat_r, out)
    return jnp.where(both_nan, jnp.nan, out)
