"""Calibrate emulated-float64 primitive throughput on the attached TPU.

Times one full-array pass of each primitive over a (62500, 4000) block (the
exact-path chunk geometry) in f64 and f32, plus compact (62500, 192)-shaped
fit-sized passes, plus the f32 Pallas sort alone.  Informs which stages of
the exact path are worth moving to double-float Pallas kernels.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

B, S = 62_500, 4000
M = 191
N_ITERS = 4


def timeit(name, fn, *args):
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
    n_el = args[0].size
    print(f"{name:40s} {best*1e3:9.2f} ms   {n_el/best/1e9:8.2f} Gelem/s",
          flush=True)
    return best


def salted(x, salt):
    return lax.dynamic_update_slice(x, x[:64] + salt.astype(x.dtype), (0, 0))


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x64 = jax.random.normal(key, (B, S), dtype=jnp.float64) * 0.5 - 2.0
    jax.block_until_ready(x64)
    x32 = x64.astype(jnp.float32)
    t64 = jax.random.normal(key, (B, M), dtype=jnp.float64) * 0.5 - 2.0
    jax.block_until_ready(t64)

    def mk(op, red=jnp.sum):
        @jax.jit
        def f(x, salt):
            return red(op(salted(x, salt)))
        return f

    # full-block (B, S) passes
    timeit("f64 sum only (1 add/elt)", mk(lambda x: x), x64)
    timeit("f32 sum only", mk(lambda x: x), x32)
    timeit("f64 mul x*x + sum", mk(lambda x: x * x), x64)
    timeit("f32 mul x*x + sum", mk(lambda x: x * x), x32)
    timeit("f64 exp + sum", mk(jnp.exp), x64)
    timeit("f32 exp + sum", mk(jnp.exp), x32)
    timeit("f64 log(|x|+1e-3) + sum", mk(lambda x: jnp.log(jnp.abs(x) + 1e-3)), x64)
    timeit("f64 log1p(-0.1x) + sum", mk(lambda x: jnp.log1p(-0.1 * x)), x64)
    timeit("f64 expm1 + sum", mk(jnp.expm1), x64)
    timeit("f64 where(x<0, x, -x) + sum", mk(lambda x: jnp.where(x < 0, x, -x)), x64)
    timeit("f64 max-reduce rowwise", mk(lambda x: x, red=lambda x: jnp.sum(jnp.max(x, axis=1))), x64)

    # compact (B, M) fit-sized passes
    timeit("tail f64 exp + sum", mk(jnp.exp), t64)
    timeit("tail f64 43x fori mul-scan", mk(
        lambda y: lax.fori_loop(
            0, 43,
            lambda j, acc: acc * (1.0 - 0.01 * (j + 1) * y),
            jnp.ones_like(y),
        )
    ), t64)
    timeit("tail f64 log1p + sum", mk(lambda y: jnp.log1p(0.1 * jnp.abs(y))), t64)
    timeit("tail f64 expm1+log smooth-ish", mk(
        lambda y: jnp.log(jnp.abs(jnp.expm1(-0.5 * y)) + 1e-9)
    ), t64)

    # f32 pallas sort alone at the exact-path geometry
    from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

    @jax.jit
    def psort(x, salt):
        return jnp.sum(pallas_topk_desc(salted(x, salt), M + 1))

    timeit("f32 pallas_topk_desc k=192", psort, x32)

    @jax.jit
    def psort_pair(x, salt):
        xs = salted(x, salt)
        hi = xs.astype(jnp.float32)
        lo = (xs - hi.astype(jnp.float64)).astype(jnp.float32)
        return jnp.sum(pallas_topk_desc(hi, M + 1)) + jnp.sum(lo[:, :1])

    timeit("split hi/lo + f32 sort (no pair net)", psort_pair, x64)

    from pyloo_tpu.ops.selection import topk_vals_desc

    @jax.jit
    def cascade64(x, salt):
        return jnp.sum(topk_vals_desc(salted(x, salt), M + 1))

    timeit("f64 cascade topk (current)", cascade64, x64)


if __name__ == "__main__":
    main()
