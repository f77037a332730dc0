"""Benchmark: PSIS throughput at 4000 draws (the BASELINE.json north star).

Runs the fused PSIS-LOO scoring kernel (tail selection, GPD fit, inverse-CDF
smoothing, weighted elpd/lppd reductions) over 1M observations x 4000 draws
in float32 and prints one JSON line.

Methodology: the synthetic log-likelihood is generated on device from
deterministic keys, so a generation-only pass and a generation+PSIS pass see
identical data; their wall-clock difference isolates the PSIS kernel.  A
single scalar that depends on every chunk is fetched at the end (on the
tunneled TPU, block_until_ready does not actually synchronize — only a
device-to-host fetch does).

The baseline is the reference's per-observation NumPy loop (argsort +
Zhang-Stephens fit per row, /root/reference/pyloo/psis.py:114-160), ~1e4
rows/sec on one CPU core (SURVEY.md §6 cost model).

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
    n_chunks = TOTAL_OBS // CHUNK

    @jax.jit
    def make_chunk(key):
        # mildly heavy-tailed synthetic log-weights
        return 1.5 * jax.random.normal(key, (CHUNK, N_DRAWS), dtype=jnp.float32)

    @jax.jit
    def smooth(chunk):
        elpd_i, k, lppd_i = loo_scores_psis_fast(-chunk, m_tail)
        return jnp.sum(elpd_i), jnp.sum(k), jnp.sum(lppd_i)

    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)

    # compile + warm both programs, force completion with a fetch
    e, k, l = smooth(make_chunk(keys[0]))
    _ = float(e + k + l)

    def run(include_psis: bool) -> tuple[float, float]:
        t0 = time.perf_counter()
        acc = jnp.zeros((), dtype=jnp.float32)
        ksum = jnp.zeros((), dtype=jnp.float32)
        for i in range(n_chunks):
            chunk = make_chunk(keys[i])
            if include_psis:
                e, kv, l = smooth(chunk)
                acc = acc + e
                ksum = ksum + kv
            else:
                acc = acc + chunk[0, 0]
        total = float(acc)  # single d2h fetch synchronizes everything
        return time.perf_counter() - t0, float(ksum) / TOTAL_OBS

    gen_s, _ = run(include_psis=False)
    full_s, mean_khat = run(include_psis=True)
    psis_s = max(full_s - gen_s, 1e-9)

    obs_per_sec = TOTAL_OBS / psis_s
    result = {
        "metric": "psis_obs_per_sec_4k_draws",
        "value": round(obs_per_sec, 1),
        "unit": "obs/s",
        "vs_baseline": round(obs_per_sec / REFERENCE_OBS_PER_SEC, 2),
        "detail": {
            "total_obs": TOTAL_OBS,
            "n_draws": N_DRAWS,
            "psis_wall_s": round(psis_s, 3),
            "datagen_wall_s": round(gen_s, 3),
            "end_to_end_wall_s": round(full_s, 3),
            "device": str(dev),
            "dtype": "float32",
            "mean_khat": round(mean_khat, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
