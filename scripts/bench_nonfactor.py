"""Benchmark: non-factorized MVN/MVT conditional LOO at scale (VERDICT r2 #7).

Per-draw work is one N x N Cholesky + triangular solve against I (O(N^3)),
batched over a draw chunk on device; S=1000 draws are streamed in chunks
sized to HBM (a (chunk, N, N) f64 covariance stack plus its factor and
L^-1).  The reference loops draws in Python and additionally pays an
O(N * N^2) per-observation deletion loop for Student-t
(loo_nonfactor.py:519-557).

Run on the axon TPU:  python scripts/bench_nonfactor.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from pyloo_tpu.ops.nonfactor import mvn_conditional_loglik, mvt_conditional_loglik

S_TOTAL = 1000


def bench_case(N, chunk, model, seed=0, near_singular=False):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(N, N)) / np.sqrt(N)
    base = jnp.asarray(A @ A.T + np.eye(N))
    y = jnp.asarray(rng.multivariate_normal(np.zeros(N), np.asarray(base)))
    mu = jnp.asarray(rng.normal(0, 0.05, size=(chunk, N)))
    jitter = jnp.asarray(rng.normal(0, 0.01, size=(chunk,)))

    if model == "mvn":
        def chunk_fn(salt):
            covs = base[None] + (jitter + salt)[:, None, None] * jnp.eye(N)
            ll = mvn_conditional_loglik(y, mu, cov=covs)
            return jnp.sum(jnp.where(jnp.isfinite(ll), ll, 0.0))
    else:
        df = jnp.asarray(rng.uniform(3, 10, size=(chunk,)))

        def chunk_fn(salt):
            covs = base[None] + (jitter + salt)[:, None, None] * jnp.eye(N)
            ll = mvt_conditional_loglik(y, mu, df, cov=covs)
            return jnp.sum(jnp.where(jnp.isfinite(ll), ll, 0.0))

    fn = jax.jit(chunk_fn)
    _ = float(fn(jnp.float64(0.0)))  # compile + warm
    n_chunks = S_TOTAL // chunk
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float64)
    for i in range(n_chunks):
        acc = acc + fn(jnp.float64(i) * 1e-9)
    _ = float(acc)
    wall = time.perf_counter() - t0
    return {
        "N": N,
        "S": S_TOTAL,
        "chunk": chunk,
        "model": model,
        "near_singular": near_singular,
        "wall_s": round(wall, 2),
        "draw_chol_per_sec": round(S_TOTAL / wall, 1),
    }


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rows = []
    for N, chunk in ((2000, 40), (3000, 20), (5000, 8)):
        for model in ("mvn", "student_t"):
            r = bench_case(N, chunk, model)
            print(json.dumps(r), flush=True)
            rows.append(r)
    print(json.dumps({"metric": "nonfactor_bench", "rows": rows}))


if __name__ == "__main__":
    main()
