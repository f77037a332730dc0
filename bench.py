"""Benchmark: PSIS throughput at 4000 draws (the BASELINE.json north star).

Runs the fused PSIS-LOO scoring kernel (tail selection, GPD fit, inverse-CDF
smoothing, weighted elpd/lppd reductions) over 1M observations x 4000 draws
in float32 and prints one JSON line.

Methodology notes for the tunneled TPU:
* ``block_until_ready`` does not truly synchronize — only a device-to-host
  fetch does — so a single scalar depending on every chunk is fetched once
  at the end of the timed region.
* The runtime serves *result-cached* answers for repeated identical
  (program, arguments) executions, so every timed invocation must see
  distinct inputs: two pre-materialized resident chunks are perturbed by a
  per-iteration salt (one extra elementwise pass, ~2% overhead).

The baseline is the reference's per-observation NumPy loop (argsort +
Zhang-Stephens fit per row, /root/reference/pyloo/psis.py:114-160), ~1e4
rows/sec on one CPU core (SURVEY.md §6 cost model).

Run:  python bench.py            (uses the default JAX platform — TPU here)
"""

import json
import os
import sys
import time

import jax

# NOTE: the persistent compilation cache must stay OFF under the axon
# remote-compile plugin (verified: cache-write runs succeed, cache-read runs
# block indefinitely).  pyloo_tpu's rcParams["device.compilation_cache"]
# default "auto" detects axon via JAX_PLATFORMS and skips it — no manual
# config needed here.

import jax.numpy as jnp

sys.path.insert(0, ".")

from pyloo_tpu.ops import tail_length  # noqa: E402
from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast  # noqa: E402

N_DRAWS = 4000
TOTAL_OBS = 1_000_000
CHUNK = 125_000  # 125k x 4000 f32 = 2 GB per input chunk
N_RESIDENT = 2  # device-resident base chunks (4 GB of 16 GB HBM)
REFERENCE_OBS_PER_SEC = 1.0e4  # SURVEY.md §6: 1e3-1e4 rows/s; generous end


def bench_streaming_api(dev):
    """End-to-end public API at 1M x 4000: loo_streaming over a synthetic
    on-device logistic-regression posterior (the product path, not the
    kernel)."""
    from pyloo_tpu.streaming import loo_streaming

    n_feat = 32
    key = jax.random.PRNGKey(7)
    beta = 0.3 * jax.random.normal(key, (N_DRAWS, n_feat), jnp.float32)
    kx, ky = jax.random.split(key)
    xw = jax.random.normal(kx, (TOTAL_OBS, n_feat), jnp.float32) * 0.5
    yw = (jax.random.uniform(ky, (TOTAL_OBS,)) < 0.5).astype(jnp.float32)
    _ = float(beta[0, 0]) + float(xw[0, 0])  # materialize

    def log_lik_fn(idx):
        x = xw[idx]  # (chunk, n_feat)
        eta = x @ beta.T  # (chunk, n_draws)
        y = yw[idx][:, None]
        return y * eta - jnp.logaddexp(0.0, eta)

    # chunk_size divides TOTAL_OBS exactly: the default (~2 GB = 134216
    # rows) leaves a ragged last chunk whose padding is wasted compute;
    # 250k chunks measured slower (HBM pressure), 125k is the sweet spot
    kw = dict(dtype=jnp.float32, chunk_size=125_000)
    # Round 4 cold-start protocol: pl.warmup() AOT-compiles the heavy
    # chunk-step programs at startup (the documented production pattern),
    # so the "cold" first real call pays only the user-generator compile.
    # warmup_wall_s records the startup cost that moved out of first-call
    # latency; warmup+cold together stay comparable with the r1-r3
    # api_loo_streaming_cold_wall_s (which had no warmup).
    import pyloo_tpu as pl

    t0 = time.perf_counter()
    pl.warmup(TOTAL_OBS, N_DRAWS, **kw)
    warmup_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = loo_streaming(log_lik_fn, TOTAL_OBS, N_DRAWS, **kw)
    cold_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = loo_streaming(log_lik_fn, TOTAL_OBS, N_DRAWS, **kw)
    wall = time.perf_counter() - t0
    return wall, cold_wall, warmup_wall, float(r["elpd_loo"])


def bench_draw_sweep():
    """Fast-kernel throughput across draw counts, crossing every selection
    regime: S=1000/2000/4000 (Pallas N=256), 8000 draws = 4 chains x 2000
    (M+1=270 -> the N=512 two-tile path), 16000 (N=256, 64 segments),
    32768/65536 (tail k > 512 -> the N=1024 tier, round 4), and 100000
    (beyond one pass's 64-segment cap -> the 2-part multipass merge).  Each
    row records the dispatch route so no regime is a silent fallback; a
    cliff at a regime boundary would mean a fallback is being hit."""
    from pyloo_tpu.ops.selection import fast_path_route

    sweep = {}
    for s in (1000, 2000, 8000, 16000, 32768, 65536, 100_000):
        rows = max(1024, min(CHUNK, (CHUNK * N_DRAWS) // s))
        m = tail_length(s, 1.0)
        x = 1.5 * jax.random.normal(
            jax.random.PRNGKey(s), (rows, s), dtype=jnp.float32
        )
        _ = float(x[0, 0])

        @jax.jit
        def smooth_s(chunk, salt):
            e, k, l, _d = loo_scores_psis_fast(-(chunk + salt), m)
            return jnp.sum(e)

        _ = float(smooth_s(x, jnp.float32(0.0)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(4):
            acc = acc + smooth_s(x, jnp.float32(i) * jnp.float32(1e-6))
        _ = float(acc)
        dt = (time.perf_counter() - t0) / 4
        _stage(f"draw sweep S={s}: {rows / dt:.0f} obs/s")
        sweep[f"S={s}"] = {
            "rows": rows,
            "tail": m + 1,
            "route": fast_path_route(rows, s, m + 1, jnp.float32),
            "obs_per_sec": round(rows / dt, 1),
        }
        # land completed rows immediately so a truncated run keeps them
        _PARTIAL["detail"]["fast_kernel_draw_sweep"] = dict(sweep)
        del x
    return sweep


def bench_heavy_tail():
    """Smoothing-heavy row: Cauchy-tailed importance ratios at the bench
    shape, where most rows take the full GPD-fit + inverse-CDF path (the
    rng(0)-normal headline sits at mean k-hat ~0.44; this one lands ~1).
    Answers VERDICT r3 'every round benches the same synthetic data'."""
    rows, s = CHUNK, N_DRAWS
    m = tail_length(s, 1.0)
    key = jax.random.PRNGKey(99)
    # standard Cauchy = t(df=1): ratio of two normals
    kn, kd = jax.random.split(key)
    x = jax.random.normal(kn, (rows, s), jnp.float32) / jnp.maximum(
        jnp.abs(jax.random.normal(kd, (rows, s), jnp.float32)), 1e-6
    )
    _ = float(x[0, 0])

    @jax.jit
    def smooth_s(chunk, salt):
        e, k, l, _d = loo_scores_psis_fast(-(chunk + salt), m)
        # k = +inf marks degenerate tails (sigma <= 0 / tied tail): keep the
        # JSON strictly parseable by summarizing finite k and counting inf
        fin = jnp.isfinite(k)
        return (
            jnp.sum(e),
            jnp.sum(jnp.where(fin, k, 0.0)),
            jnp.sum(fin),
        )

    e0, k0, n0 = smooth_s(x, jnp.float32(0.0))
    _ = float(e0 + k0 + n0)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    ksum = jnp.zeros((), jnp.float32)
    nfin = jnp.zeros((), jnp.float32)
    for i in range(4):
        e, kv, nf = smooth_s(x, jnp.float32(i) * jnp.float32(1e-6))
        acc, ksum, nfin = acc + e, ksum + kv, nfin + nf
    _ = float(acc)
    dt = (time.perf_counter() - t0) / 4
    n_fin = float(nfin)
    return {
        "rows": rows,
        "n_draws": s,
        "mean_finite_khat": round(float(ksum) / max(n_fin, 1.0), 4),
        "frac_k_nonfinite": round(1.0 - n_fin / (4 * rows), 4),
        "obs_per_sec": round(rows / dt, 1),
    }


def bench_exact_f64(base):
    """Exact float64 PSIS path (selection + scatter parity kernel).

    METHODOLOGY (changed round 3): earlier rounds stored float32 residents
    and cast + full-array-salted INSIDE the timed region — two f64
    arithmetic passes over 250M elements (~200 ms/chunk on emulated-f64
    TPU) of pure measurement artifact that a user holding f64 data never
    pays.  Residents are now cast to f64 once outside the timed region, and
    the anti-result-caching salt perturbs only the first 64 rows via
    ``dynamic_update_slice`` (a bandwidth-bound copy, ~2 GB, no f64
    arithmetic) — every timed call still sees distinct inputs.
    """
    from jax import lax

    from pyloo_tpu.ops.loo_kernels import loo_scores_psis

    m_tail = tail_length(N_DRAWS, 1.0)
    half = CHUNK // 2  # 2 GB f64 chunks
    base64 = [c[:half].astype(jnp.float64) for c in base]
    _ = [float(c[0, 0]) for c in base64]  # materialize outside the timing

    @jax.jit
    def smooth64(chunk, salt):
        salted = lax.dynamic_update_slice(chunk, chunk[:64] + salt, (0, 0))
        e, k, l = loo_scores_psis(-salted, m_tail)
        return jnp.sum(e)

    # TWO warmup calls: the first covers compile; the SECOND covers a
    # one-time ~10 s post-compile settling on the axon server (measured:
    # call pattern is [compile, ~10 s, then steady ~270 ms forever] — the
    # settling call is a per-executable server artifact like compile, not
    # per-call work, so it is excluded like compile and recorded below).
    zero = jnp.float64(0.0)
    _ = float(smooth64(base64[0], zero))
    t_settle = time.perf_counter()
    _ = float(smooth64(base64[0], jnp.float64(-1.0) * 1e-6))
    settle_wall = time.perf_counter() - t_settle
    n_iters = TOTAL_OBS // half
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float64)
    for i in range(n_iters):
        acc = acc + smooth64(base64[i % N_RESIDENT], jnp.float64(i + 1) * 1e-6)
    _ = float(acc)
    dt = time.perf_counter() - t0
    del base64
    return dt, settle_wall


def _stage(msg):
    """Stage progress on stderr (stdout is reserved for the JSON line) so a
    timeout leaves a record of where the time went."""
    print(f"[bench +{time.perf_counter() - _T_START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T_START = time.perf_counter()


def _sanitize(obj):
    """Strict-JSON guard: json.dumps would emit bare Infinity/NaN literals
    (invalid JSON) for non-finite floats; stringify them instead."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and (obj != obj or obj in (float("inf"), float("-inf"))):
        return str(obj)
    return obj

# Progressive result assembly: each completed stage lands its numbers here,
# and a SIGTERM (what `timeout` and most drivers send) emits the JSON for
# whatever finished instead of dying silently.  A fully cold axon server
# spends ~5 min compiling the resident-chunk RNG program alone, so a tight
# external budget must still yield a usable (marked-truncated) result line.
_PARTIAL = {
    "metric": "loo_1m_x_4k_draws_obs_per_sec",
    "value": None,
    "unit": "obs/s",
    "vs_baseline": None,
    "detail": {"total_obs": TOTAL_OBS, "n_draws": N_DRAWS},
}
_STAGE_NAME = ["startup"]


def _emit_partial(signum, frame):
    _PARTIAL["detail"]["truncated_at_stage"] = _STAGE_NAME[0]
    _PARTIAL["detail"]["truncated_wall_s"] = round(
        time.perf_counter() - _T_START, 1
    )
    if _PARTIAL["value"] is None:
        # headline stage never finished: fall back to the salted kernel
        # loop's number if that stage completed, else report zero progress
        kv = _PARTIAL["detail"].get("kernel_salted_loop_obs_per_sec")
        _PARTIAL["value"] = kv if kv is not None else 0.0
        _PARTIAL["vs_baseline"] = round(
            (_PARTIAL["value"] or 0.0) / REFERENCE_OBS_PER_SEC, 2
        )
        _PARTIAL["detail"]["metric_note"] = (
            "TRUNCATED RUN (SIGTERM before the streaming-API stage):"
            " value falls back to the salted kernel loop"
        )
    print(json.dumps(_sanitize(_PARTIAL)), flush=True)
    os._exit(0)


def main():
    import signal

    signal.signal(signal.SIGTERM, _emit_partial)
    dev = jax.devices()[0]
    _PARTIAL["detail"]["device"] = str(dev)
    _PARTIAL["detail"]["dtype"] = "float32"
    _stage(f"backend up: {dev}")
    _STAGE_NAME[0] = "resident chunk materialization"
    m_tail = tail_length(N_DRAWS, 1.0)
    n_chunks = TOTAL_OBS // CHUNK

    base = [
        1.5
        * jax.random.normal(
            jax.random.PRNGKey(i), (CHUNK, N_DRAWS), dtype=jnp.float32
        )
        for i in range(N_RESIDENT)
    ]
    # force materialization on device
    _ = [float(c[0, 0]) for c in base]

    @jax.jit
    def smooth(chunk, salt):
        elpd_i, k, lppd_i, _degen = loo_scores_psis_fast(-(chunk + salt), m_tail)
        return jnp.sum(elpd_i), jnp.sum(k), jnp.sum(lppd_i)

    zero = jnp.zeros((), jnp.float32)
    _stage("f32 kernel: compiling")
    _STAGE_NAME[0] = "f32 kernel compile + salted loop"
    e, k, l = smooth(base[0], zero)  # compile + warm
    _ = float(e + k + l)

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    ksum = jnp.zeros((), jnp.float32)
    for i in range(n_chunks):
        salt = jnp.float32(i) * jnp.float32(1e-6)
        e, kv, l = smooth(base[i % N_RESIDENT], salt)
        acc = acc + e
        ksum = ksum + kv
    total = float(acc)  # single d2h fetch synchronizes everything
    wall = time.perf_counter() - t0
    mean_khat = float(ksum) / TOTAL_OBS

    obs_per_sec = TOTAL_OBS / wall
    _PARTIAL["detail"].update(
        kernel_salted_loop_obs_per_sec=round(obs_per_sec, 1),
        kernel_salted_loop_wall_s=round(wall, 3),
        mean_khat=round(mean_khat, 4),
    )

    _stage(f"f32 salted loop done ({wall:.2f}s); streaming API bench")
    _STAGE_NAME[0] = "streaming API (warmup + cold + warm)"
    api_wall, api_cold_wall, api_warmup_wall, api_elpd = bench_streaming_api(dev)
    _PARTIAL["value"] = round(TOTAL_OBS / api_wall, 1)
    _PARTIAL["vs_baseline"] = round(
        TOTAL_OBS / api_wall / REFERENCE_OBS_PER_SEC, 2
    )
    _PARTIAL["detail"].update(
        api_loo_streaming_wall_s=round(api_wall, 3),
        api_loo_streaming_cold_wall_s=round(api_cold_wall, 3),
        api_warmup_wall_s=round(api_warmup_wall, 3),
        api_loo_streaming_elpd=round(api_elpd, 1),
    )
    _stage(f"streaming API done (warm {api_wall:.2f}s cold {api_cold_wall:.2f}s warmup {api_warmup_wall:.2f}s); f64 bench")
    _STAGE_NAME[0] = "exact f64"
    f64_wall, f64_settle = bench_exact_f64(base)
    del base
    _PARTIAL["detail"].update(
        exact_f64_wall_s=round(f64_wall, 3),
        exact_f64_obs_per_sec=round(TOTAL_OBS / f64_wall, 1),
        exact_f64_settle_wall_s=round(f64_settle, 3),
    )
    _stage(f"f64 done ({f64_wall:.2f}s); draw sweep")
    _STAGE_NAME[0] = "draw sweep"
    draw_sweep = bench_draw_sweep()
    _PARTIAL["detail"]["fast_kernel_draw_sweep"] = draw_sweep
    _stage("draw sweep done; heavy tail")
    _STAGE_NAME[0] = "heavy tail"
    heavy_tail = bench_heavy_tail()

    # Headline = the public API path (loo_streaming): log-likelihood
    # evaluation + fused Pallas PSIS scoring + reductions for 1M x 4000 on
    # one chip.  METRIC NOTE (round 2+): the headline is the WARM second
    # call — compile excluded and the chunk-generator program memoized
    # (pyloo_tpu.streaming._gen_program); rounds before that memoization
    # paid the generator compile each call, so compare their trends against
    # api_loo_streaming_cold_wall_s instead.  The salted kernel loop
    # (detail) measures the score kernel under the anti-result-caching
    # methodology; its salt pass and per-chunk dispatch are measurement
    # artifacts the product path does not pay.
    result = {
        "metric": "loo_1m_x_4k_draws_obs_per_sec",
        "value": round(TOTAL_OBS / api_wall, 1),
        "unit": "obs/s",
        "vs_baseline": round(TOTAL_OBS / api_wall / REFERENCE_OBS_PER_SEC, 2),
        "detail": {
            "total_obs": TOTAL_OBS,
            "n_draws": N_DRAWS,
            "api_loo_streaming_wall_s": round(api_wall, 3),
            "api_loo_streaming_cold_wall_s": round(api_cold_wall, 3),
            "api_warmup_wall_s": round(api_warmup_wall, 3),
            "api_loo_streaming_elpd": round(api_elpd, 1),
            "metric_note": (
                "headline is the warm 2nd loo_streaming call (generator"
                " memoized); round 4+: pl.warmup() precompiles the chunk"
                " programs at startup (api_warmup_wall_s), so cold_wall is"
                " first-call latency AFTER warmup (generator compile only);"
                " warmup+cold together compare with r1-r3 cold_wall"
            ),
            "device": str(dev),
            "dtype": "float32",
            "kernel_salted_loop_obs_per_sec": round(obs_per_sec, 1),
            "kernel_salted_loop_wall_s": round(wall, 3),
            "mean_khat": round(mean_khat, 4),
            "exact_f64_wall_s": round(f64_wall, 3),
            "exact_f64_obs_per_sec": round(TOTAL_OBS / f64_wall, 1),
            "exact_f64_settle_wall_s": round(f64_settle, 3),
            "exact_f64_metric_note": (
                "round 3+: residents pre-cast to f64 and salted via a"
                " 64-row dynamic_update_slice; earlier rounds timed a"
                " cast+full-salt artifact (~3 s per 1M obs) inside the"
                " loop.  settle_wall is the one-time post-compile server"
                " settling call, excluded from the sweep like compile"
            ),
            "fast_kernel_draw_sweep": draw_sweep,
            "heavy_tail_bench": heavy_tail,
        },
    }
    print(json.dumps(_sanitize(result)))


def _main_with_retries():
    """Re-exec on infra failures: the axon tunnel intermittently refuses or
    drops fresh clients (RESOURCE_EXHAUSTED / HTTP-500 remote_compile /
    backend-init UNAVAILABLE) while the server reaps a previous client.
    JAX caches a failed backend init for the process lifetime, so the retry
    must relaunch the interpreter, not loop in-process.  Exponential-ish
    backoff; stdout stays reserved for the single JSON result line."""
    attempt = int(os.environ.get("PYLOO_BENCH_ATTEMPT", "0"))
    max_attempts = int(os.environ.get("PYLOO_BENCH_MAX_ATTEMPTS", "6"))
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — any failure here is infra
        if attempt + 1 >= max_attempts:
            raise
        wait = min(60 * (attempt + 1), 240)
        print(
            f"bench attempt {attempt + 1} failed ({type(exc).__name__}:"
            f" {exc}); retrying in {wait}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(wait)
        os.environ["PYLOO_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retries()
