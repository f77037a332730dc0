"""Compare exact f64 top-(M+1) selection strategies on the attached TPU.

The exact PSIS path spends ~104 ms of a ~271 ms chunk in ``topk_vals_desc``
over (62.5k, 4000) float64 (the G=4-equivalent approx_max_k cascade with
1000-wide segments).  This sweeps the competitive exact alternatives:

  * the current cascade at several segment widths,
  * single-stage ``approx_max_k`` / ``lax.top_k`` / full ``jnp.sort``,
  * a segment-sort cascade (``jnp.sort`` per 512/1024-segment, slice top-k,
    then one narrow second stage),
  * an XLA bitonic pairwise-merge second stage over per-segment sorted
    prefixes.

Run: python scripts/profile_selection_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from pyloo_tpu.ops import tail_length
from pyloo_tpu.ops.selection import topk_vals_desc, _single

B, S = 62_500, 4000
K = tail_length(S, 1.0) + 1  # 191
N_ITERS = 4


def timeit(name, fn, *args):
    try:
        for _ in range(2):
            jax.block_until_ready(fn(*args, jnp.float64(0.0)))
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            acc = None
            for i in range(N_ITERS):
                out = fn(*args, jnp.float64(i + 1) * 1e-9)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = leaf if acc is None else acc + leaf
            jax.block_until_ready(acc)
            best = min(best, (time.perf_counter() - t0) / N_ITERS)
        print(f"{name:44s} {best*1e3:9.1f} ms   {B/best/1e3:8.1f}k rows/s",
              flush=True)
        return best
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:90]}", flush=True)
        return None


def salted(x, salt):
    return lax.dynamic_update_slice(x, x[:64] + salt, (0, 0))


def seg_sort_cascade(x, k, seg):
    """Per-segment jnp.sort (descending) + slice + narrow second stage."""
    b, s = x.shape
    g = -(-s // seg)
    pad = g * seg - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xs = x.reshape(b, g, seg)
    w = jnp.sort(xs, axis=-1, descending=True)[:, :, : min(k, seg)]
    return _single(w.reshape(b, -1), k)


def merge_cascade(x, k, seg):
    """Per-segment sort + log2(G) bitonic pairwise merges of k-prefixes."""
    b, s = x.shape
    g = 1
    while g * seg < s:
        g *= 2
    pad = g * seg - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xs = x.reshape(b, g, seg)
    w = jnp.sort(xs, axis=-1, descending=True)[:, :, : min(k, seg)]
    kk = w.shape[-1]
    # pad prefix to a power of two for the bitonic re-sort
    n = 1
    while n < kk:
        n *= 2
    if n != kk:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, n - kk)),
                    constant_values=-jnp.inf)
    while w.shape[1] > 1:
        a = w[:, 0::2]
        bb = jnp.flip(w[:, 1::2], axis=-1)
        v = jnp.maximum(a, bb)  # top-n of each pair, bitonic
        j = n // 2
        while j >= 1:
            m = v.shape[-1] // (2 * j)
            vv = v.reshape(v.shape[0], v.shape[1], m, 2, j)
            hi = jnp.maximum(vv[:, :, :, 0], vv[:, :, :, 1])
            lo = jnp.minimum(vv[:, :, :, 0], vv[:, :, :, 1])
            v = jnp.stack([hi, lo], axis=3).reshape(v.shape)
            j //= 2
        w = v
    return w[:, 0, :k]


def main():
    print(f"device={jax.devices()[0]}  ({B}x{S})->{K} f64", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S), dtype=jnp.float64)
    jax.block_until_ready(x)

    def mk(f):
        @jax.jit
        def g(xx, salt):
            return jnp.sum(f(salted(xx, salt)))
        return g

    ref = None
    import numpy as np

    def check(f, name):
        out = f(x[:128])
        exp = jax.lax.top_k(x[:128], K)[0]
        ok = bool(jnp.max(jnp.abs(out - exp)) == 0)
        if not ok:
            print(f"  !! {name} MISMATCHES exact top-k", flush=True)

    check(lambda xx: topk_vals_desc(xx, K), "cascade")
    check(lambda xx: seg_sort_cascade(xx, K, 512), "seg_sort_512")
    check(lambda xx: merge_cascade(xx, K, 512), "merge_512")

    timeit("current cascade (topk_vals_desc)", mk(lambda xx: topk_vals_desc(xx, K)), x)
    timeit("single-stage approx_max_k", mk(lambda xx: _single(xx, K)), x)
    timeit("lax.top_k full width", mk(lambda xx: jax.lax.top_k(xx, K)[0]), x)
    timeit("jnp.sort full width + slice", mk(
        lambda xx: jnp.sort(xx, axis=-1, descending=True)[:, :K]), x)
    for seg in (500, 1000, 2000):
        timeit(f"approx cascade seg={seg}", mk(
            lambda xx, seg=seg: _single(
                _single(
                    xx.reshape(B, S // seg, seg), min(K, seg)
                ).reshape(B, -1),
                K,
            )), x)
    for seg in (512, 1024):
        timeit(f"segment jnp.sort cascade seg={seg}", mk(
            lambda xx, seg=seg: seg_sort_cascade(xx, K, seg)), x)
    for seg in (512, 1024):
        timeit(f"sort+bitonic-merge cascade seg={seg}", mk(
            lambda xx, seg=seg: merge_cascade(xx, K, seg)), x)


if __name__ == "__main__":
    main()
