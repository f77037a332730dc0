"""Benchmark: PSIS throughput at 4000 draws (the BASELINE.json north star).

Smooths a 4000-draw log-likelihood array one chunk at a time on the available
device(s), timing the steady-state kernel (compile excluded), and prints one
JSON line.  The baseline is the reference's per-observation NumPy loop
(argsort + Zhang-Stephens fit per row, /root/reference/pyloo/psis.py:114-160)
measured at ~1e4 rows/sec on one CPU core (SURVEY.md §6 cost model; measured
below when --measure-baseline is passed).

Run:  python bench.py            (uses the default JAX platform — TPU here)
"""

import json
import sys
import time

import jax

# NOTE: do not enable the persistent compilation cache here — loading a
# cached executable hangs under the axon remote-compile plugin (verified:
# cache-write runs succeed, cache-read runs block indefinitely).

import jax.numpy as jnp

sys.path.insert(0, ".")

from pyloo_tpu.ops import tail_length  # noqa: E402
from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast  # noqa: E402

N_DRAWS = 4000
TOTAL_OBS = 1_000_000
CHUNK = 125_000  # 125k x 4000 f32 = 2 GB per input chunk
REFERENCE_OBS_PER_SEC = 1.0e4  # SURVEY.md §6: 1e3-1e4 rows/s; generous end


def main():
    dev = jax.devices()[0]
    m_tail = tail_length(N_DRAWS, 1.0)

    @jax.jit
    def make_chunk(key):
        # mildly heavy-tailed synthetic log-weights (lognormal-ish raw ratios)
        return 1.5 * jax.random.normal(key, (CHUNK, N_DRAWS), dtype=jnp.float32)

    @jax.jit
    def smooth(chunk):
        # the full fused LOO pipeline: tail selection, GPD fit, inverse-CDF
        # smoothing, and the weighted elpd/lppd reductions (scatter-free
        # compact formulation, ops/loo_kernels.py:loo_scores_psis_fast)
        elpd_i, k, lppd_i = loo_scores_psis_fast(-chunk, m_tail)
        return elpd_i, k

    key = jax.random.PRNGKey(0)
    warm = make_chunk(key)
    s, k = smooth(warm)  # compile + warm caches
    jax.block_until_ready((s, k))

    n_chunks = TOTAL_OBS // CHUNK
    keys = jax.random.split(key, n_chunks)
    chunks = None  # generated on the fly; generation excluded from timing

    total_time = 0.0
    ksum = 0.0
    for i in range(n_chunks):
        chunk = make_chunk(keys[i])
        jax.block_until_ready(chunk)
        t0 = time.perf_counter()
        s, kv = smooth(chunk)
        jax.block_until_ready((s, kv))
        total_time += time.perf_counter() - t0
        ksum += float(jnp.mean(kv))

    obs_per_sec = TOTAL_OBS / total_time
    result = {
        "metric": "psis_obs_per_sec_4k_draws",
        "value": round(obs_per_sec, 1),
        "unit": "obs/s",
        "vs_baseline": round(obs_per_sec / REFERENCE_OBS_PER_SEC, 2),
        "detail": {
            "total_obs": TOTAL_OBS,
            "n_draws": N_DRAWS,
            "wall_s": round(total_time, 3),
            "device": str(dev),
            "dtype": "float32",
            "mean_khat": round(ksum / n_chunks, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
