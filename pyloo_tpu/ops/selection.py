"""Exact top-k row selection tuned for TPU.

``jax.lax.top_k`` and single-stage ``approx_max_k`` both lower to a bitonic
partial sort over the FULL row width; on TPU that sort — not the HBM
streaming — dominates (measured ~135 ms on-chip for (125k, 4000)->191
against a ~2.4 ms single-pass floor on v5e).  Bitonic cost per element grows
with the sorted width, so an exact segmented cascade is faster:

  stage 1: top-k within each of G segments of width S/G
  stage 2: top-k of the concatenated G*k per-segment winners

Exactness: every global top-k element is a top-k element of its own segment,
so the union of per-segment winners is a superset of the global top-k.
Measured on a v5e chip at (125k, 4000)->191: 170 ms single-stage vs 115 ms
for the G=4 cascade (identical outputs); G=2/G=8/3-stage variants all
slower (145/137/123+ ms).

Values-only: the cascade does not track original column indices (stage-2
indices point into the stage-1 winner array), which is exactly what the
scatter-free fast LOO kernel consumes.  Index-returning callers
(``psislw_batch``'s scatter path) keep single-stage selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["topk_vals_desc", "topk_with_idx", "topk_hybrid_f64"]

# Segment width for the first cascade stage.  1000 was the measured optimum
# at S=4000, k=191; rows narrower than _MIN_CASCADE_WIDTH or k too close to
# the segment width fall back to single-stage selection.
_SEGMENT_WIDTH = 1000
_MIN_CASCADE_WIDTH = 2000

# Use the Pallas bitonic kernel (ops/pallas_topk.py) on real TPUs where it
# applies; the approx_max_k cascade remains the portable path (CPU tests,
# unsupported shapes, float64).  The row gate only bounds padding waste —
# one grid step covers up to 128 rows, so anything smaller gains nothing
# from the kernel but loses nothing either.
_PALLAS_MIN_ROWS = 128


def _pallas_applicable(x, k: int) -> bool:
    if jax.default_backend() != "tpu" or x.dtype != jnp.float32:
        return False
    if x.ndim != 2 or x.shape[0] < _PALLAS_MIN_ROWS:
        return False
    from .pallas_topk import supports

    return supports(x.shape[-1], k)


# NOTE — rejected design (round 5): a Pallas lexicographic PAIR sort for
# float64 selection (hi = f32(x), lo = f32(x - hi), compare hi then lo).
# The kernel was built and interpret-verified, but the split is NOT exact:
# two f32 planes carry ~48 mantissa bits against float64's 53, so
# ``hi + lo`` reconstructs x only to ~2^-49 relative and sub-2^-48
# near-ties sort by the rounded value — the "exact" path would no longer
# be exact by construction.  An exact THREE-plane split (hi/mid/lo — the
# second residual is exactly representable in 29 bits, so 24+24+29 covers
# 53) costs ~3.4-4x the f32 sort's vector ops per compare-exchange, which
# lands at or above the approx_max_k cascade's measured 104 ms at
# (62.5k, 4000)->191 — no win, plus a mandatory split pass.  Variants that
# compare fewer planes and repair afterwards all reintroduce either a
# per-row gather (measured 8x slower than the cascade in round 3's hybrid
# episode, see ``topk_hybrid_f64``) or a full-row tie-census pass.  The
# cascade stays.


def fast_path_route(b: int, s: int, k: int, dtype) -> str:
    """Which selection path ``loo_scores_psis_fast`` takes for (B, S, k).

    One source of truth for the kernel dispatch AND for benchmark/diagnostic
    reporting, so no regime is a silent fallback:

    * ``"pallas"`` — one fused prepass pass (TPU, float32, B >= 128,
      ``supports(S, k)``: k <= 1024, S <= 64 * list_height);
    * ``"pallas-multipass"`` — draw-axis split into <= 16 supported parts
      with an exact XLA-side merge (S beyond one pass's segment cap);
    * ``"cascade"`` — the exact segmented ``approx_max_k`` cascade
      (portable path: CPU, float64, k > 1024, or B < 128 where one grid
      step would be mostly padding).
    """
    if (
        jax.default_backend() != "tpu"
        or jnp.dtype(dtype) != jnp.float32
        or b < _PALLAS_MIN_ROWS
    ):
        return "cascade"
    from .pallas_topk import multipass_parts, supports

    if supports(s, k):
        return "pallas"
    parts = multipass_parts(s, k)
    if parts is not None and parts > 1:
        return "pallas-multipass"
    return "cascade"


def topk_vals_desc(x, k: int):
    """Exact top-k values of each row of ``x``, descending.  (B, S) -> (B, k).

    Equivalent to ``jax.lax.top_k(x, k)[0]``; dispatches to the Pallas
    bitonic sort-and-merge kernel on TPU (float32, supported shapes) and to
    the segmented ``approx_max_k`` cascade elsewhere.
    """
    s = x.shape[-1]
    if _pallas_applicable(x, k):
        from .pallas_topk import pallas_topk_desc

        return pallas_topk_desc(x, k, variant="roll")
    if k == s:
        return jnp.sort(x, axis=-1, descending=True)
    # the segment must hold at least 2k so stage 1 shrinks the width; for
    # large k (e.g. the PSIS tail at S > 29k draws: k = 3*sqrt(S)+1 > 500)
    # the fixed 1000-wide segments would silently degrade to a full-width
    # single-stage sort — scale the width with k instead
    seg_width = max(_SEGMENT_WIDTH, 2 * k)
    if s < max(_MIN_CASCADE_WIDTH, 2 * seg_width):
        return _single(x, k)

    g = max(s // seg_width, 2)
    seg = -(-s // g)  # ceil; pad the ragged tail with -inf
    pad = g * seg - s
    if pad:
        fill = jnp.full(x.shape[:-1] + (pad,), -jnp.inf, dtype=x.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
    xs = x.reshape(x.shape[:-1] + (g, seg))
    winners = _single(xs, min(k, seg))
    return _single(winners.reshape(x.shape[:-1] + (g * min(k, seg),)), k)


def _single(x, k: int):
    vals, _ = jax.lax.approx_max_k(x, k, recall_target=1.0)
    return vals


def topk_with_idx(x, k: int):
    """Exact top-k values AND source indices per row, descending.

    Like ``jax.lax.top_k`` but routed through the segmented cascade on wide
    rows (stage-2 winner indices are composed back to global column indices
    with one narrow gather).  Tie note: which member of a run of equal
    values is returned is unspecified (``lax.top_k`` picks the lowest
    index); values are exact either way.
    """
    s = x.shape[-1]
    if k == s or s < _MIN_CASCADE_WIDTH or _SEGMENT_WIDTH < 2 * k:
        return jax.lax.top_k(x, k)

    g = max(s // _SEGMENT_WIDTH, 2)
    seg = -(-s // g)
    pad = g * seg - s
    if pad:
        fill = jnp.full(x.shape[:-1] + (pad,), -jnp.inf, dtype=x.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
    xs = x.reshape(x.shape[:-1] + (g, seg))
    kk = min(k, seg)
    w_vals, w_idx = jax.lax.approx_max_k(xs, kk, recall_target=1.0)
    offs = (jnp.arange(g, dtype=w_idx.dtype) * seg)[
        (None,) * (x.ndim - 1) + (slice(None), None)
    ]
    w_gidx = (w_idx + offs).reshape(x.shape[:-1] + (g * kk,))
    v2, i2 = jax.lax.approx_max_k(
        w_vals.reshape(x.shape[:-1] + (g * kk,)), k, recall_target=1.0
    )
    idx = jnp.take_along_axis(w_gidx, i2, axis=-1)
    return v2, idx


# Extra proxy-selection slots beyond k: the float32 tie class straddling the
# selection boundary must fit in this margin (else the row falls back to
# full-width float64 selection — see ``topk_hybrid_f64``).
_HYBRID_PAD = 64


def topk_hybrid_f64(xs, k: int):
    """Exact descending top-k of float64 rows at float32 selection speed.

    TPU's float64 is software-emulated, so a full-width f64 ``top_k``
    dominates the exact PSIS path.  Selection however only needs the
    *order*, and float32 rounding is monotone: selecting ``k + PAD``
    candidates on the f32 proxy, gathering their true f64 values, and
    re-selecting top-k among the narrow candidates gives bit-identical
    values whenever the proxy tie class at the selection boundary either
    fits in the padding or is f64-constant.

    Returns ``(vals, ok)``: ``vals`` is ``(B, k)`` f64 descending; ``ok``
    is ``(B,)`` bool, True where the selection is PROVABLY exact.  Rows
    with ``ok == False`` (adversarial: > PAD f64-distinct values inside one
    f32 ulp exactly at the boundary) must be recomputed with
    ``lax.top_k(xs, k)``.

    Proof sketch: with ``t`` the smallest selected proxy, every true top-k
    element has proxy >= t (if its proxy were < t, the >= k elements with
    proxy >= t would all strictly exceed it in f64 by monotonicity).
    Elements with proxy > t are all selected; so the selection can only
    miss top-k members from the proxy tie class at ``t``, and then only if
    the tie class overflows the padding with f64-distinct values.
    """
    B, S = xs.shape
    cap = min(k + _HYBRID_PAD, S)
    proxy = xs.astype(jnp.float32)
    if cap == S:
        vals = jnp.sort(xs, axis=-1, descending=True)[:, :k]
        return vals, jnp.ones((B,), bool)
    pv, pidx = topk_with_idx(proxy, cap)
    # ragged-row padding can be selected when a row holds > S - cap ``-inf``
    # entries; those candidate indices point past S and must gather -inf,
    # not a clamped real value
    cand = jnp.take_along_axis(
        xs, pidx, axis=1, mode="fill", fill_value=-jnp.inf
    )  # (B, cap) f64
    vals = jax.lax.top_k(cand, k)[0]

    t = pv[:, cap - 1]  # smallest selected proxy
    n_gt = jnp.sum((proxy > t[:, None]).astype(jnp.int32), axis=1)
    n_eq = jnp.sum((proxy == t[:, None]).astype(jnp.int32), axis=1)
    tie = proxy == t[:, None]
    tie_max = jnp.max(jnp.where(tie, xs, -jnp.inf), axis=1)
    tie_min = jnp.min(jnp.where(tie, xs, jnp.inf), axis=1)
    ok = (
        (n_gt >= k)  # boundary tie class entirely below the top-k
        | (n_gt + n_eq <= cap)  # whole tie class selected
        | (tie_max == tie_min)  # tie class f64-constant: any choice exact
    )
    return vals, ok
