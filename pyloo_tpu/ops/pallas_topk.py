"""Pallas TPU kernel: exact per-row top-256 selection, descending.

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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_topk_desc", "supports"]

_N = 256  # per-lane list length; also the max supported k
_LANES = 128


def supports(s: int, k: int) -> bool:
    """Shapes this kernel handles: k <= 256 and <= 16 segments of 256."""
    return 0 < k <= _N and s <= _N * 16 and s >= 2


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
        v = in_ref[0, b]  # (256, 128): lane = seg * rows + row
        v = _bitonic_sort_desc(v)
        dist = rows
        while dist < _LANES:
            partner = pltpu.roll(v, shift=_LANES - dist, axis=1)
            v = jnp.maximum(v, _rev_sublanes(partner))
            v = _bitonic_merge_desc(v)
            dist *= 2
        out_ref[0, b] = v[:, :rows]


@partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_topk_desc(x, k: int, *, interpret: bool = False):
    """Exact top-k values of each row, descending.  (B, S) -> (B, k).

    Requires ``supports(S, k)``; rows are padded with ``-inf`` so any
    ``B``/``S`` within range works.
    """
    b_in, s = x.shape
    if not supports(s, k):
        raise ValueError(f"pallas_topk_desc does not support S={s}, k={k}")
    n_segs = 1
    while n_segs * _N < s:
        n_segs *= 2
    rows = _LANES // n_segs
    s_pad = n_segs * _N

    blk = 4  # row-blocks per grid step (DMA amortization)
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
        xp.reshape(grid, blk, rows, n_segs, _N)
        .transpose(0, 1, 4, 3, 2)
        .reshape(grid, blk, _N, _LANES)
    )

    out = pl.pallas_call(
        partial(_kernel, n_segs, rows, blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (1, blk, _N, _LANES),
                lambda j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, blk, _N, rows),
            lambda j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((grid, blk, _N, rows), x.dtype),
        interpret=interpret,
    )(xt)

    res = out.transpose(0, 1, 3, 2).reshape(b_pad, _N)[:b_in, :k]
    return res
