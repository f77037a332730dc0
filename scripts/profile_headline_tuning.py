"""Headline-path tuning sweep: chunk size and prepass row-block depth.

The warm 1M x 4000 loo_streaming call runs 8 x 125k-row chunk steps at
~97 ms each; the fused prepass alone accounts for ~62 ms, leaving ~35 ms
of fit/closing/dispatch per chunk.  This sweeps (a) the chunk size (fewer,
larger dispatches vs HBM pressure) and (b) the Pallas prepass ``blk``
(DMA amortization) to see whether the r3 headline (1.324M obs/s) can be
recovered.  Run: python scripts/profile_headline_tuning.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pyloo_tpu.streaming import loo_streaming

TOTAL_OBS = 1_000_000
N_DRAWS = 4000


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    n_feat = 32
    key = jax.random.PRNGKey(7)
    beta = 0.3 * jax.random.normal(key, (N_DRAWS, n_feat), jnp.float32)
    kx, ky = jax.random.split(key)
    xw = jax.random.normal(kx, (TOTAL_OBS, n_feat), jnp.float32) * 0.5
    yw = (jax.random.uniform(ky, (TOTAL_OBS,)) < 0.5).astype(jnp.float32)
    _ = float(beta[0, 0]) + float(xw[0, 0])

    def log_lik_fn(idx):
        x = xw[idx]
        eta = x @ beta.T
        y = yw[idx][:, None]
        return y * eta - jnp.logaddexp(0.0, eta)

    # stage split of the f32 chunk step at the headline geometry: fused
    # prepass alone vs the full tiled kernel (prepass + signed-log fit +
    # smoothing + reductions).  The r3 note records the f32 signed-log scan
    # at ~49 ms per (125k, 191) — if that holds, the fit, not the prepass,
    # is the headline lever.
    import time as _t

    from jax import lax

    from pyloo_tpu.ops import tail_length
    from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast_tiled
    from pyloo_tpu.ops.pallas_topk import (
        pallas_loo_prepass_tiled,
        tile_rows,
    )

    B = 125_000
    m = tail_length(N_DRAWS, 1.0)
    key2 = jax.random.PRNGKey(3)
    xr = jax.random.normal(key2, (B, N_DRAWS), jnp.float32)
    _ = float(xr[0, 0])

    @jax.jit
    def f_tile_only(x, salt):
        xs = lax.dynamic_update_slice(x, x[:64] + salt, (0, 0))
        xt = tile_rows(xs, m + 1)
        return jnp.sum(xt[:, :1, :1])

    @jax.jit
    def f_prepass(x, salt):
        xs = lax.dynamic_update_slice(x, x[:64] + salt, (0, 0))
        xt = tile_rows(xs, m + 1)
        v, c, ntl, ll = pallas_loo_prepass_tiled(xt, B, N_DRAWS, m + 1)
        return jnp.sum(v) + jnp.sum(c) + jnp.sum(ntl) + jnp.sum(ll)

    @jax.jit
    def f_full(x, salt):
        xs = lax.dynamic_update_slice(x, x[:64] + salt, (0, 0))
        xt = tile_rows(xs, m + 1)
        e, k, l, d = loo_scores_psis_fast_tiled(
            xt, b_in=B, s=N_DRAWS, tail_max=m
        )
        return jnp.sum(e) + jnp.sum(k) + jnp.sum(l)

    for name, f in (
        ("tile_rows only", f_tile_only),
        ("tiled prepass", f_prepass),
        ("full tiled kernel", f_full),
    ):
        for _w in range(2):
            jax.block_until_ready(f(xr, jnp.float32(0.0)))
        best = float("inf")
        for rep in range(2):
            t0 = _t.perf_counter()
            acc = None
            for i in range(4):
                out = f(xr, jnp.float32(rep * 4 + i + 1) * 1e-6)
                acc = out if acc is None else acc + out
            jax.block_until_ready(acc)
            best = min(best, (_t.perf_counter() - t0) / 4)
        print(f"{name:20s} {best*1e3:7.1f} ms per {B} rows", flush=True)

    for chunk in (62_500, 100_000, 125_000, 200_000, 250_000):
        try:
            r = loo_streaming(
                log_lik_fn, TOTAL_OBS, N_DRAWS,
                dtype=jnp.float32, chunk_size=chunk,
            )  # compile + warm
            best = float("inf")
            for _rep in range(3):
                t0 = time.perf_counter()
                r = loo_streaming(
                    log_lik_fn, TOTAL_OBS, N_DRAWS,
                    dtype=jnp.float32, chunk_size=chunk,
                )
                best = min(best, time.perf_counter() - t0)
            print(
                f"chunk={chunk:7d}  warm {best:6.3f} s  "
                f"{TOTAL_OBS/best/1e6:.3f}M obs/s  elpd={r['elpd_loo']:.1f}",
                flush=True,
            )
        except Exception as e:
            print(f"chunk={chunk}: FAILED {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
