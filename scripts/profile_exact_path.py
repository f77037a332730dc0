"""Profile the reference-exact float64 PSIS path on the real TPU.

Times the new hybrid-selection exact kernel (f32-proxy candidates + f64
gather/fit + scatter-free reductions) against its components, per 62.5k x
4000 chunk, with the anti-result-caching salt methodology from bench.py.

Run on the axon TPU:  python scripts/profile_exact_path.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from pyloo_tpu.ops import tail_length
from pyloo_tpu.ops.loo_kernels import _nontail_mass, loo_scores_psis
from pyloo_tpu.ops.lse import logsumexp
from pyloo_tpu.ops.selection import topk_hybrid_f64, topk_with_idx

CHUNK = 62_500
S = 4000
M = tail_length(S, 1.0)
N_ITERS = 4


def timeit(name, fn, *args):
    out = fn(*args, jnp.float64(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for i in range(N_ITERS):
        out = fn(*args, jnp.float64(i) * 1e-9)
        leaf = jax.tree_util.tree_leaves(out)[0]
        acc = leaf if acc is None else acc + leaf
    jax.block_until_ready(acc)
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{name:34s} {dt*1e3:9.1f} ms/chunk   {CHUNK/dt/1e3:9.1f}k obs/s",
          flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]}  chunk={CHUNK}x{S}  M={M}", flush=True)
    key = jax.random.PRNGKey(0)
    # resident base stays float32 (1 GB); every timed fn casts to f64
    # inside jit, exactly like bench.py's exact-path methodology.  The axon
    # server can briefly hold a just-exited client's HBM; retry the first
    # allocation instead of dying on ResourceExhausted.
    for attempt in range(6):
        try:
            base32 = 1.5 * jax.random.normal(key, (CHUNK, S), dtype=jnp.float32)
            _ = float(base32[0, 0])
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 5:
                raise
            print(f"alloc retry {attempt + 1} after: {str(e)[:80]}", flush=True)
            time.sleep(30)
    base = base32

    @jax.jit
    def full_exact(x, salt):
        e, k, l = loo_scores_psis(x.astype(jnp.float64) + salt, M)
        return jnp.sum(e) + jnp.sum(k) + jnp.sum(l)

    @jax.jit
    def rowmax_shift(x, salt):
        xr = -(x.astype(jnp.float64) + salt)
        C = jnp.max(xr, axis=1)
        return jnp.sum(C)

    @jax.jit
    def proxy_cascade(x, salt):
        xr = -(x.astype(jnp.float64) + salt)
        C = jnp.max(xr, axis=1)
        xs = xr - C[:, None]
        pv, pidx = topk_with_idx(xs.astype(jnp.float32), M + 1 + 64)
        return jnp.sum(pv) + jnp.sum(pidx)

    @jax.jit
    def hybrid_sel(x, salt):
        xr = -(x.astype(jnp.float64) + salt)
        C = jnp.max(xr, axis=1)
        xs = xr - C[:, None]
        vals, ok = topk_hybrid_f64(xs, M + 1)
        return jnp.sum(vals) + jnp.sum(ok)

    @jax.jit
    def f64_topk(x, salt):
        xr = -(x.astype(jnp.float64) + salt)
        C = jnp.max(xr, axis=1)
        xs = xr - C[:, None]
        vals = jax.lax.top_k(xs, M + 1)[0]
        return jnp.sum(vals)

    @jax.jit
    def nontail(x, salt):
        xr = -(x.astype(jnp.float64) + salt)
        C = jnp.max(xr, axis=1)
        xs = xr - C[:, None]
        return jnp.sum(_nontail_mass(xs, jnp.full((CHUNK,), -3.0, jnp.float64)))

    @jax.jit
    def lppd(x, salt):
        return jnp.sum(logsumexp(x.astype(jnp.float64) + salt, axis=1, b_inv=S))

    timeit("rowmax only", rowmax_shift, base)
    timeit("proxy cast + f32 cascade(idx)", proxy_cascade, base)
    timeit("hybrid selection (full)", hybrid_sel, base)
    timeit("nontail f64 logsumexp pass", nontail, base)
    timeit("lppd f64 logsumexp pass", lppd, base)
    dt = timeit("FULL exact loo_scores_psis", full_exact, base)
    print(f"projected 1M-obs wall: {1e6 / CHUNK * dt:.2f} s", flush=True)
    timeit("f64 lax.top_k (old path sel)", f64_topk, base)


if __name__ == "__main__":
    main()
