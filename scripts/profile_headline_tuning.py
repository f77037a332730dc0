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
