"""Microbenchmark of top-(M+1) selection strategies on the real TPU chip.

The fast LOO kernel needs the top-(M+1) *values* (descending) of each row
of a (B, S) float32 log-likelihood matrix (M+1 = 191 at S = 4000). This
script times candidate strategies under the axon quirks documented in
bench.py: salted inputs per repetition (the tunnel caches identical
(program, args) executions) and one dependent-scalar d2h fetch as the
synchronization point.

Run ad hoc: python scripts/profile_selection.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, K = 125_000, 4000, 191
REPS = 3


def timed(name, fn, args_list):
    # warmup compile on the first arg set
    out = fn(*args_list[0])
    float(jnp.ravel(out)[0])
    times = []
    for args in args_list[:REPS]:
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.ravel(out)[0])  # dependent fetch = sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:42s} {best*1e3:9.1f} ms   (all: {[f'{t*1e3:.0f}' for t in times]})  probe={s:.3f}")
    return best


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    base = rng.normal(-1.0, 0.5, size=(B, S)).astype(np.float32)
    args_list = [
        (jax.device_put(base + np.float32(0.001 * i)),) for i in range(REPS + 1)
    ]

    @jax.jit
    def full_approx(x):
        v, _ = jax.lax.approx_max_k(x, K, recall_target=1.0)
        return v

    @jax.jit
    def approx_no_agg(x):
        v, _ = jax.lax.approx_max_k(x, K, recall_target=1.0, aggregate_to_topk=False)
        return v

    @jax.jit
    def approx_95(x):
        v, _ = jax.lax.approx_max_k(x, K, recall_target=0.95)
        return v

    @jax.jit
    def plain_topk(x):
        v, _ = jax.lax.top_k(x, K)
        return v

    @jax.jit
    def sum_only(x):  # HBM floor: one streaming pass
        return jnp.sum(x, axis=1)

    @jax.jit
    def max_only(x):
        return jnp.max(x, axis=1)

    @jax.jit
    def bisect_count(x):
        # 25 iterations of threshold bisection on the value range;
        # returns per-row threshold (not the extraction) — measures the
        # count-pass cost only.
        lo = jnp.min(x, axis=1)
        hi = jnp.max(x, axis=1)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(x > mid[:, None], axis=1)
            take_lower = cnt >= K
            return (jnp.where(take_lower, mid, lo), jnp.where(take_lower, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 25, body, (lo, hi))
        return lo

    @jax.jit
    def sort_full(x):
        return jax.lax.sort(x, dimension=1)[:, -K:]

    timed("sum (1-pass HBM floor)", sum_only, args_list)
    timed("max (1-pass HBM floor)", max_only, args_list)
    timed("approx_max_k recall=1.0 (current)", full_approx, args_list)
    timed("approx_max_k recall=1.0 no-aggregate", approx_no_agg, args_list)
    timed("approx_max_k recall=0.95", approx_95, args_list)
    timed("bisection count x25 (threshold only)", bisect_count, args_list)
    try:
        timed("lax.top_k exact", plain_topk, args_list)
    except Exception as e:
        print(f"lax.top_k failed: {e}")
    try:
        timed("full lax.sort", sort_full, args_list)
    except Exception as e:
        print(f"lax.sort failed: {e}")


if __name__ == "__main__":
    main()
