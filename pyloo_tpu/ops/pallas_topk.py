"""Pallas TPU kernel: exact per-row top-k selection (k <= 512), descending.

The fast-path PSIS pipeline needs the top-(M+1) values of every row of a
``(B, S)`` log-weight array (M ~ 190 at S = 4000).  XLA's top-k family lowers
to a bitonic partial sort over the FULL row width; the segmented
``approx_max_k`` cascade (``selection.py``) improves on it but still spends
~85 ms of a ~130 ms chunk in selection.  This kernel restructures the
problem so every compare-exchange is a full-width vector op with *static*
sublane addressing:

  * Each block handles R rows; a row is split into ``n_segs`` segments of
    256 elements.  A host-side XLA transpose lays the block out as a
    ``(256, n_segs * R)`` tile: each of the 128 lanes holds one segment as a
    256-tall column.
  * Phase 1: one 256-input bitonic sorting network (36 stages) sorts ALL 128
    lanes simultaneously along the sublane axis — static strided slicing +
    ``max``/``min``/``where``, no lane shuffles.
  * Phase 2: ``log2(n_segs)`` max-merge rounds.  Two descending lists A, B
    satisfy: ``max(A_i, B_{255-i})`` holds the top-256 of A ∪ B as a bitonic
    sequence (the first half-cleaner layer of a 512-merge); one static lane
    roll aligns segment pairs, a sublane flip + max performs the layer, and
    an 8-stage bitonic merge re-sorts.  After the rounds, lanes 0..R-1 hold
    each row's exact top-256, descending.

Exactness: every global top-256 element is a top-256 element of its own
segment, and max-merge of exact prefixes is exact.

Values-only (like ``selection.topk_vals_desc``): source indices are not
tracked, which is what the scatter-free LOO kernel consumes.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_topk_desc",
    "pallas_loo_prepass",
    "pallas_loo_prepass_tiled",
    "prepass_geometry",
    "supports",
    "tile_rows",
]

_N = 256  # default per-lane list length (k <= 256); k <= 512 uses 512
_LANES = 128


def _list_height(k: int) -> int | None:
    """Smallest supported per-lane list height covering ``k``.

    256/512/1024-tall lists; the sort body (:func:`_sort_roll`) is
    parametric in the height, so taller lists cost only more compare-
    exchange stages (n log^2 n) and VMEM (a (1024, 128) f32 tile is 512 KB;
    blk=4 double-buffered is ~4 MB, well inside a TPU core's VMEM).  1024
    matters because the PSIS tail k = 3*sqrt(S/reff)+1 outgrows 512 at
    S ~ 29k draws — the k-cap, not the S-cap, bounded the fast path.
    """
    if k <= 0:
        return None
    if k <= 256:
        return 256
    if k <= 512:
        return 512
    if k <= 1024:
        return 1024
    return None

# tracing the fully unrolled sort network (~100 stages x 4 row-blocks of
# chained ops) exceeds CPython's default 1000-frame recursion limit
if sys.getrecursionlimit() < 100_000:
    sys.setrecursionlimit(100_000)


def supports(s: int, k: int) -> bool:
    """Shapes one kernel pass handles: k <= 1024 and <= 64 segments per row.

    k <= 256 uses 256-tall per-lane lists (S up to 16384); k <= 512 uses
    512-tall lists (S up to 32768); k <= 1024 uses 1024-tall lists (S up to
    65536 — covers the reff=1 PSIS tail, k = 3*sqrt(S)+1, for every S in
    range).  Beyond the S cap, :func:`multipass_parts` splits the draw axis
    into independently-supported parts whose results merge exactly.
    """
    n = _list_height(k)
    return n is not None and 2 <= s <= n * 64


def multipass_parts(s: int, k: int, max_parts: int = 16) -> int | None:
    """Draw-axis part count for the multipass prepass (1 = single pass).

    ``None`` when no split helps: k > 1024 (the per-part top-k must be the
    full global k for the merge to stay exact — a part cannot return more
    than its list height), or more than ``max_parts`` parts would be
    needed.
    """
    n = _list_height(k)
    if n is None or s < 2:
        return None
    cap = n * 64
    if s <= cap:
        return 1
    parts = -(-s // cap)
    return parts if parts <= max_parts else None


def _cmpex_desc(v, j: int):
    """Compare-exchange at sublane stride ``j``, all groups descending."""
    g = _N // (2 * j)
    w = v.reshape(g, 2, j, v.shape[-1])
    a, b = w[:, 0], w[:, 1]
    return jnp.stack(
        [jnp.maximum(a, b), jnp.minimum(a, b)], axis=1
    ).reshape(v.shape)


def _cmpex_bidir(v, j: int, k: int):
    """Compare-exchange at stride ``j`` with bitonic directions for stage ``k``.

    Element ``i`` pairs with ``i + j``; the pair orders descending iff
    ``(i & k) == 0``.  The direction flips every ``k`` elements, so exposing
    the direction as an explicit reshape axis keeps everything static — no
    captured mask constants (Pallas kernels cannot close over arrays).
    """
    lanes = v.shape[-1]
    a_blk = _N // (2 * k)  # pairs of direction runs
    b_blk = k // (2 * j)  # exchange groups per run
    w = v.reshape(a_blk, 2, b_blk, 2, j, lanes)
    a, b = w[:, :, :, 0], w[:, :, :, 1]  # (A, 2, B, j, L)
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    desc = jnp.stack([hi[:, 0], lo[:, 0]], axis=2)  # (A, B, 2, j, L)
    asc = jnp.stack([lo[:, 1], hi[:, 1]], axis=2)
    return jnp.stack([desc, asc], axis=1).reshape(v.shape)


def _bitonic_sort_desc(v):
    """Full 256-input bitonic sort along axis 0, descending, all lanes."""
    for k in (2, 4, 8, 16, 32, 64, 128):
        j = k // 2
        while j >= 1:
            v = _cmpex_bidir(v, j, k)
            j //= 2
    return _bitonic_merge_desc(v)  # final stage k = 256: all descending


def _bitonic_merge_desc(v):
    """Re-sort a per-lane bitonic sequence to descending (8 layers)."""
    j = _N // 2
    while j >= 1:
        v = _cmpex_desc(v, j)
        j //= 2
    return v


def _rev_sublanes(v):
    """Reverse axis 0 with static block swaps (Mosaic has no ``rev``).

    Index reversal ``i -> n-1-i`` complements every bit, i.e. swaps the two
    halves of every 2j-block at each of the log2(n) levels.
    """
    j = _N // 2
    while j >= 1:
        w = v.reshape(_N // (2 * j), 2, j, v.shape[-1])
        v = jnp.stack([w[:, 1], w[:, 0]], axis=1).reshape(v.shape)
        j //= 2
    return v


def _kernel(n_segs: int, rows: int, blk: int, in_ref, out_ref):
    for b in range(blk):
        v = in_ref[b]  # (256, 128): lane = seg * rows + row
        v = _bitonic_sort_desc(v)
        dist = rows
        while dist < _LANES:
            partner = pltpu.roll(v, shift=jnp.int32(_LANES - dist), axis=1)
            v = jnp.maximum(v, _rev_sublanes(partner))
            v = _bitonic_merge_desc(v)
            dist *= 2
        out_ref[b] = v[:, :rows]


def _cmpex_roll(v, j: int, desc):
    """Compare-exchange at sublane stride ``j`` via cyclic sublane rotates.

    ``desc``: boolean direction per element, broadcastable to ``v`` — True
    where the pair containing that element orders descending.  Element ``i``
    pairs with ``i ^ j``: two rotates fetch both neighbor candidates and an
    iota mask picks the true partner; no value reshapes (Mosaic lowers those
    to vreg shuffle chains, measured ~2x slower than rotate-based exchange).
    """
    down = pltpu.roll(v, shift=jnp.int32(_N - j), axis=0)  # v[i + j]
    up = pltpu.roll(v, shift=jnp.int32(j), axis=0)  # v[i - j]
    i = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0)
    has_bit = (
        jax.lax.rem(jax.lax.div(i, jnp.int32(j)), jnp.int32(2))
        != jnp.int32(0)
    )
    partner = jnp.where(has_bit, up, down)
    hi = jnp.maximum(v, partner)
    lo = jnp.minimum(v, partner)
    keep_hi = desc != has_bit  # XOR: first slot of a desc pair keeps the max
    return jnp.where(keep_hi, hi, lo)


def _kernel_roll(n_segs: int, rows: int, blk: int, n: int, in_ref, out_ref):
    """Rotate-based variant: no value reshapes, no sublane reversal.

    Phase 1 sorts each lane's ``n``-list descending or ascending by segment
    parity; each merge round then reduces to an elementwise ``max`` of a
    desc/asc pair (the half-cleaner needs no flip), and the log2(n)-stage
    bitonic re-sort orders the result for the segment's role in the NEXT
    round.
    """
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    # all scalar arithmetic in explicit int32: mixing Python ints with
    # kernel tracers under jax_enable_x64 recurses in dtype promotion
    seg = jax.lax.div(lane, jnp.int32(rows))

    for b in range(blk):
        v = _sort_roll(in_ref[b], rows, i_sub, seg, n)
        out_ref[b] = v[:, :rows]


def _cmpex_roll_desc(v, j: int, n: int):
    """All-descending compare-exchange at sublane stride ``j`` (5 vector ops).

    Bit-clear slots keep ``max(v_i, v_{i+j})``, bit-set slots keep
    ``min(v_{i-j}, v_i)`` — no partner select needed when every pair orders
    the same way.
    """
    down = pltpu.roll(v, shift=jnp.int32(n - j), axis=0)  # v[i + j]
    up = pltpu.roll(v, shift=jnp.int32(j), axis=0)  # v[i - j]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    has_bit = (
        jax.lax.rem(jax.lax.div(i, jnp.int32(j)), jnp.int32(2))
        != jnp.int32(0)
    )
    return jnp.where(has_bit, jnp.minimum(v, up), jnp.maximum(v, down))


def _sort_roll(v, rows: int, i_sub, seg, n: int):
    """The _kernel_roll sort body on one (n, 128) tile: descending lists
    land in lanes 0..rows-1.

    Mixed sort directions are handled by the sign-flip trick: negating the
    ascending-direction elements (direction is constant within every
    compare-exchange pair) makes the whole stage descending, so each
    exchange is the 5-op direction-free form; the negation costs two
    multiplies per stage group instead of one select per exchange.
    """
    flip = jax.lax.rem(seg, jnp.int32(2)) != jnp.int32(0)
    one = jnp.ones((), v.dtype)
    k = 2
    while k <= n:
        if k < n:
            stage_desc = (
                jax.lax.rem(jax.lax.div(i_sub, jnp.int32(k)), jnp.int32(2))
                == jnp.int32(0)
            )
        else:
            stage_desc = jnp.full((n, 1), True)
        desc = stage_desc != flip
        s = jnp.where(desc, one, -one)
        v = v * s
        j = k // 2
        while j >= 1:
            v = _cmpex_roll_desc(v, j, n)
            j //= 2
        v = v * s
        k *= 2
    dist = rows
    t = 1
    while dist < _LANES:
        partner = pltpu.roll(v, shift=jnp.int32(_LANES - dist), axis=1)
        v = jnp.maximum(v, partner)
        flip_next = (
            jax.lax.rem(jax.lax.div(seg, jnp.int32(1 << t)), jnp.int32(2))
            != jnp.int32(0)
        )
        s = jnp.where(flip_next, -one, one)
        v = v * s
        j = n // 2
        while j >= 1:
            v = _cmpex_roll_desc(v, j, n)
            j //= 2
        v = v * s
        dist *= 2
        t += 1
    return v


def _lane_tree(v, op, rows: int):
    """Reduce across each lane's congruence class mod ``rows``.

    After the log-tree of cyclic lane rotates every lane holds the reduction
    over {l, l+rows, l+2*rows, ...} — i.e. each of the row's segment lanes
    ends up with the full-row value, already aligned for broadcasting.
    """
    d = rows
    while d < _LANES:
        v = op(v, pltpu.roll(v, shift=jnp.int32(_LANES - d), axis=1))
        d *= 2
    return v


def _kernel_fused(
    n_segs: int, rows: int, blk: int, k_cut: int, floor: float, n: int,
    in_ref, out_ref, aux_ref,
):
    """Sort + fused per-row reductions for the PSIS fast path.

    Per row (one VMEM visit of the raw data): the shifted sorted top-``n``,
    the row max C, the tail cutoff (order statistic ``k_cut`` with the
    reference float64-tiny floor, ``pyloo/psis.py:90``), the non-tail exp
    mass relative to the cutoff, and the lppd logsumexp pieces — removing
    three full HBM passes from the XLA side of ``loo_scores_psis_fast``.
    """
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    seg = jax.lax.div(lane, jnp.int32(rows))
    lane_ok = lane < jnp.int32(rows)

    for b in range(blk):
        v0 = in_ref[b]  # (n, 128) raw x = -log_lik, NOT shifted
        c_row = _lane_tree(
            jnp.max(v0, axis=0, keepdims=True), jnp.maximum, rows
        )  # (1, 128): every lane already holds its row's max
        xs = v0 - c_row

        v = _sort_roll(xs, rows, i_sub, seg, n)

        xcut = jnp.maximum(v[k_cut : k_cut + 1, :], floor)  # (1, 128)
        # valid only in lanes < rows; rebroadcast to all segment lanes
        xcut_full = _lane_tree(
            jnp.where(lane_ok, xcut, 0.0), jnp.add, rows
        )
        nt = jnp.where(xs <= xcut_full, jnp.exp(xs - xcut_full), 0.0)
        s_nt = _lane_tree(jnp.sum(nt, axis=0, keepdims=True), jnp.add, rows)

        # lppd pieces: logsumexp over the row of ll = -x_raw.  The sort
        # padding is -inf, which must not reach the row min (it would NaN
        # the exp): padded positions are masked to +inf / zero contribution.
        pad = jnp.isneginf(v0)
        v0m = jnp.where(pad, jnp.inf, v0)
        r_min = _lane_tree(
            jnp.min(v0m, axis=0, keepdims=True), jnp.minimum, rows
        )
        nll = jnp.where(pad, 0.0, jnp.exp(r_min - v0))
        s_ll = _lane_tree(jnp.sum(nll, axis=0, keepdims=True), jnp.add, rows)

        aux = jnp.concatenate(
            [c_row, xcut_full, s_nt, r_min, s_ll]
            + [jnp.zeros((3, _LANES), v0.dtype)],
            axis=0,
        )  # (8, 128)
        aux_ref[b] = aux
        out_ref[b] = v[:, :rows]


class _PrepassGeom:
    """Static tiling geometry for the fused prepass (one per (B, S, k, blk))."""

    __slots__ = ("n", "n_segs", "rows", "s_pad", "b_pad", "grid")

    def __init__(self, b_in: int, s: int, k: int, blk: int):
        n = _list_height(k)
        n_segs = 1
        while n_segs * n < s:
            n_segs *= 2
        rows = _LANES // n_segs
        rows_per_step = rows * blk
        self.n = n
        self.n_segs = n_segs
        self.rows = rows
        self.s_pad = n_segs * n
        self.b_pad = -(-b_in // rows_per_step) * rows_per_step
        self.grid = self.b_pad // rows_per_step


def prepass_geometry(b_in: int, s: int, k: int, blk: int = 4) -> _PrepassGeom:
    if not supports(s, k):
        raise ValueError(f"pallas prepass does not support S={s}, k={k}")
    return _PrepassGeom(b_in, s, k, blk)


@partial(jax.jit, static_argnames=("k", "blk"))
def tile_rows(x_raw, k: int, *, blk: int = 4):
    """(B, S) raw rows -> the (grid*blk, n, 128) prepass tile layout.

    Pure XLA (pad + reshape + transpose): calling it inside the program that
    PRODUCES ``x_raw`` lets the compiler fuse the layout change into the
    producer's output write, eliding one full HBM round-trip of the natural
    layout before :func:`pallas_loo_prepass_tiled` reads the tiles.
    """
    b_in, s = x_raw.shape
    g = prepass_geometry(b_in, s, k, blk)
    xp = x_raw
    if g.s_pad != s or g.b_pad != b_in:
        xp = jnp.pad(
            x_raw,
            ((0, g.b_pad - b_in), (0, g.s_pad - s)),
            constant_values=-jnp.inf,
        )
    return (
        xp.reshape(g.grid, blk, g.rows, g.n_segs, g.n)
        .transpose(0, 1, 4, 3, 2)
        .reshape(g.grid * blk, g.n, _LANES)
    )


@partial(jax.jit, static_argnames=("k", "interpret", "blk"))
def pallas_loo_prepass(x_raw, k: int, *, interpret: bool = False, blk: int = 4):
    """Fused selection + row reductions for the float32 PSIS fast path.

    (B, S) raw ``x = -log_lik`` -> ``(vals, C, log_ntl, log_sum_ll)`` where
    ``vals`` is the shifted descending top-k, ``C`` the row max,
    ``log_ntl = log sum_{x - C <= xcutoff} exp(x - C)`` and
    ``log_sum_ll = logsumexp(-x)`` (the unnormalized lppd).
    """
    b_in, s = x_raw.shape
    xt = tile_rows(x_raw, k, blk=blk)
    return pallas_loo_prepass_tiled(
        xt, b_in, s, k, interpret=interpret, blk=blk
    )


@partial(jax.jit, static_argnames=("k", "parts", "interpret", "blk"))
def pallas_loo_prepass_multi(
    x_raw, k: int, *, parts: int, interpret: bool = False, blk: int = 4
):
    """:func:`pallas_loo_prepass` for S beyond one pass's 64-segment cap.

    Splits the draw axis into ``parts`` equal slices (each within
    :func:`supports`), runs the fused prepass per slice, and merges exactly
    on the XLA side:

    * top-k: the global top-k is a subset of the union of per-part top-k's
      (each part returns the full k), so top-k of the rebased concatenation
      is exact;
    * row max C: max over parts; per-part values rebase by ``C_p - C``;
    * non-tail mass: each part's mass below its OWN cutoff, plus the part's
      top-k values that sit between its cutoff and the merged cutoff —
      addition only (the merged cutoff provably >= every rebased part
      cutoff), so no catastrophic cancellation;
    * lppd logsumexp: ``logaddexp`` across parts.

    Same output contract as :func:`pallas_loo_prepass`.
    """
    b_in, s = x_raw.shape
    if parts < 2:
        return pallas_loo_prepass(x_raw, k, interpret=interpret, blk=blk)
    part_s = -(-s // parts)
    if not supports(part_s, k):
        raise ValueError(
            f"multipass prepass: part width {part_s} (S={s}, parts={parts})"
            f" is unsupported for k={k}"
        )
    pad = parts * part_s - s
    if pad:
        x_raw = jnp.pad(
            x_raw, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )  # -inf = zero mass; the kernel masks it out of every reduction

    vals_p, c_p, ntl_p, ll_p = [], [], [], []
    for p in range(parts):
        sl = x_raw[:, p * part_s : (p + 1) * part_s]
        v, c, ntl, ll = pallas_loo_prepass(sl, k, interpret=interpret, blk=blk)
        vals_p.append(v)
        c_p.append(c)
        ntl_p.append(ntl)
        ll_p.append(ll)

    import numpy as _np

    floor = jnp.asarray(_np.log(_np.finfo(_np.float64).tiny), x_raw.dtype)
    c_all = jnp.stack(c_p, axis=0)            # (parts, B)
    c_row = jnp.max(c_all, axis=0)            # (B,)
    shifts = c_all - c_row[None, :]           # <= 0
    rebased = [v + shifts[p][:, None] for p, v in enumerate(vals_p)]
    allv = jnp.concatenate(rebased, axis=1)   # (B, parts*k)

    from .selection import topk_vals_desc

    vals = topk_vals_desc(allv, k)
    xcut = jnp.maximum(vals[:, k - 1], floor)  # merged cutoff (B,)

    # non-tail mass relative to C (exp domain: all values <= 0, sums <= S)
    ntl_mass = jnp.zeros_like(c_row)
    for p in range(parts):
        ntl_mass = ntl_mass + jnp.exp(ntl_p[p] + shifts[p])
        # exclusion side in the PART's own domain (bit-identical to the
        # test the kernel used when it built ntl_p — rebasing both sides
        # first can flip the order under f32 rounding and double-count or
        # drop a boundary element); inclusion side in the merged domain
        xcut_p = jnp.maximum(vals_p[p][:, k - 1], floor)
        between = (vals_p[p] > xcut_p[:, None]) & (
            rebased[p] <= xcut[:, None]
        )
        ntl_mass = ntl_mass + jnp.sum(
            jnp.where(between, jnp.exp(rebased[p]), 0.0), axis=1
        )
    log_ntl = jnp.log(ntl_mass)

    log_sum_ll = ll_p[0]
    for p in range(1, parts):
        log_sum_ll = jnp.logaddexp(log_sum_ll, ll_p[p])
    return vals, c_row, log_ntl, log_sum_ll


@partial(
    jax.jit, static_argnames=("b_in", "s", "k", "interpret", "blk")
)
def pallas_loo_prepass_tiled(
    xt, b_in: int, s: int, k: int, *, interpret: bool = False, blk: int = 4
):
    """:func:`pallas_loo_prepass` over a pre-tiled input (see :func:`tile_rows`).

    Streaming callers tile inside the chunk-generator program so the layout
    change fuses with the producer; this entry then reads the tiles directly.
    """
    g = prepass_geometry(b_in, s, k, blk)
    n, n_segs, rows = g.n, g.n_segs, g.rows
    b_pad, grid = g.b_pad, g.grid
    if xt.shape != (grid * blk, n, _LANES):
        raise ValueError(
            f"tiled input has shape {xt.shape}, expected"
            f" {(grid * blk, n, _LANES)} for (B={b_in}, S={s}, k={k},"
            f" blk={blk})"
        )

    import numpy as _np

    floor = float(_np.log(_np.finfo(_np.float64).tiny))
    out, aux = pl.pallas_call(
        partial(_kernel_fused, n_segs, rows, blk, k - 1, floor, n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (blk, n, _LANES),
                lambda j: (j, 0 * j, 0 * j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (blk, n, rows),
                lambda j: (j, 0 * j, 0 * j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (blk, 8, _LANES),
                lambda j: (j, 0 * j, 0 * j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * blk, n, rows), xt.dtype),
            jax.ShapeDtypeStruct((grid * blk, 8, _LANES), xt.dtype),
        ),
        interpret=interpret,
    )(xt)

    vals = (
        out.reshape(grid, blk, n, rows)
        .transpose(0, 1, 3, 2)
        .reshape(b_pad, n)[:b_in, :k]
    )
    per_row = aux[:, :, :rows].transpose(0, 2, 1).reshape(b_pad, 8)[:b_in]
    c_row = per_row[:, 0]
    xcut = per_row[:, 1]
    log_ntl = xcut + jnp.log(per_row[:, 2])
    log_sum_ll = -per_row[:, 3] + jnp.log(per_row[:, 4])
    return vals, c_row, log_ntl, log_sum_ll


def _cmpex_lane(v, j: int, desc):
    """Compare-exchange at stride ``j`` along the last (row) axis of ``v``.

    Same pairing/selection logic as :func:`_cmpex_roll` but on the natural
    ``(rows, S)`` layout: strides that are multiples of 128 lower to static
    vreg renumbering, smaller strides to lane rotates.
    """
    w = v.shape[-1]
    down = pltpu.roll(v, shift=jnp.int32(w - j), axis=1)  # v[i + j]
    up = pltpu.roll(v, shift=jnp.int32(j), axis=1)  # v[i - j]
    i = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    has_bit = (
        jax.lax.rem(jax.lax.div(i, jnp.int32(j)), jnp.int32(2))
        != jnp.int32(0)
    )
    partner = jnp.where(has_bit, up, down)
    hi = jnp.maximum(v, partner)
    lo = jnp.minimum(v, partner)
    keep_hi = desc != has_bit
    return jnp.where(keep_hi, hi, lo)


def _kernel_natural(n_segs: int, in_ref, out_ref):
    """Natural-layout kernel: rows stay rows, no transposes anywhere.

    The input block is ``(R, n_segs*256)`` exactly as the caller stores it.
    All 256-wide segments of every row sort simultaneously through one
    bitonic network over the flat row axis (pairs ``i ^ j`` never cross a
    segment boundary for ``j < 256``); segment parity picks the direction so
    each max-merge round is a single rotate + ``max``.  The answer lands in
    columns 0..255 — a contiguous slice, so the output needs no
    rearrangement either.
    """
    v = in_ref[...]
    w = v.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def bit(div_by):
        return (
            jax.lax.rem(jax.lax.div(i, jnp.int32(div_by)), jnp.int32(2))
            != jnp.int32(0)
        )

    flip = bit(_N)  # segment parity: odd segments sort ascending
    for k in (2, 4, 8, 16, 32, 64, 128, 256):
        stage_desc = jnp.logical_not(bit(k)) if k < _N else jnp.full(
            (1, w), True
        )
        desc = stage_desc != flip  # XOR
        j = k // 2
        while j >= 1:
            v = _cmpex_lane(v, j, desc)
            j //= 2

    dist = _N
    t = 0
    while dist < w:
        partner = pltpu.roll(v, shift=jnp.int32(w - dist), axis=1)
        v = jnp.maximum(v, partner)
        # surviving super-segment (width 2*dist) parity = role next round
        flip_next = bit(2 * dist)
        j = _N // 2
        while j >= 1:
            v = _cmpex_lane(v, j, jnp.logical_not(flip_next))
            j //= 2
        dist *= 2
        t += 1
    out_ref[...] = v[:, :_N]


@partial(jax.jit, static_argnames=("k", "interpret", "variant", "blk"))
def pallas_topk_desc(
    x, k: int, *, interpret: bool = False, variant: str = "roll", blk: int = 4
):
    """Exact top-k values of each row, descending.  (B, S) -> (B, k).

    Requires ``supports(S, k)``; rows are padded with ``-inf`` so any
    ``B``/``S`` within range works.
    """
    b_in, s = x.shape
    if not supports(s, k):
        raise ValueError(f"pallas_topk_desc does not support S={s}, k={k}")
    n = _list_height(k)
    n_segs = 1
    while n_segs * n < s:
        n_segs *= 2
    rows = _LANES // n_segs
    s_pad = n_segs * n

    if variant != "roll" and n != _N:
        raise ValueError(
            f"variant {variant!r} supports only k <= {_N}; use 'roll'"
        )

    if variant == "natural":
        r_blk = 8  # rows per grid step (8 x 4096 f32 = 128 KB = 64 vregs)
        b_pad = -(-b_in // r_blk) * r_blk
        grid = b_pad // r_blk
        xp = x
        if s_pad != s or b_pad != b_in:
            xp = jnp.pad(
                x,
                ((0, b_pad - b_in), (0, s_pad - s)),
                constant_values=-jnp.inf,
            )
        out = pl.pallas_call(
            partial(_kernel_natural, n_segs),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (r_blk, s_pad),
                    lambda j: (j, 0 * j),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (r_blk, _N),
                lambda j: (j, 0 * j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b_pad, _N), x.dtype),
            interpret=interpret,
        )(xp)
        return out[:b_in, :k]

    # blk row-blocks per grid step (DMA amortization; default 4)
    rows_per_step = rows * blk
    b_pad = -(-b_in // rows_per_step) * rows_per_step
    grid = b_pad // rows_per_step

    xp = x
    if s_pad != s or b_pad != b_in:
        xp = jnp.pad(
            x,
            ((0, b_pad - b_in), (0, s_pad - s)),
            constant_values=-jnp.inf,
        )
    # lane layout: l = seg * rows + row  (roll by `rows` aligns seg pairs)
    xt = (
        xp.reshape(grid, blk, rows, n_segs, n)
        .transpose(0, 1, 4, 3, 2)
        .reshape(grid * blk, n, _LANES)
    )

    if variant == "roll":
        kern = partial(_kernel_roll, n_segs, rows, blk, n)
    else:
        kern = partial(_kernel, n_segs, rows, blk)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (blk, n, _LANES),
                # 0 * j keeps the literal zeros i32 under jax_enable_x64
                # (Mosaic rejects i64 block indices)
                lambda j: (j, 0 * j, 0 * j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (blk, n, rows),
            lambda j: (j, 0 * j, 0 * j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((grid * blk, n, rows), x.dtype),
        interpret=interpret,
    )(xt)

    res = (
        out.reshape(grid, blk, n, rows)
        .transpose(0, 1, 3, 2)
        .reshape(b_pad, n)[:b_in, :k]
    )
    return res
