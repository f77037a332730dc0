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
    # rows) leaves a ragged last chunk whose padding is wasted compute.
    # Round-5 sweep (scripts/profile_headline_tuning.py, best of 3):
    # 62.5k 1.225M / 100k 1.278M / 125k 1.297M / 200k 1.305M / 250k
    # 1.275M obs/s — 200k is the measured optimum (fewer dispatches wins
    # until ~3 GB tiles hit HBM pressure).
    kw = dict(dtype=jnp.float32, chunk_size=200_000)
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
    # headline: best of 2 warm calls (remote-tunnel dispatch jitter is
    # +-2% call to call; same guard as the kernel stages)
    wall = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        r = loo_streaming(log_lik_fn, TOTAL_OBS, N_DRAWS, **kw)
        wall = min(wall, time.perf_counter() - t0)
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


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnums=(2,))
def _smooth_k_summary(chunk, salt, m):
    """Scored chunk -> (sum elpd, sum finite k, count finite k)."""
    e, k, l, _d = loo_scores_psis_fast(-(chunk + salt), m)
    fin = jnp.isfinite(k)
    return jnp.sum(e), jnp.sum(jnp.where(fin, k, 0.0)), jnp.sum(fin)


def bench_heavy_tail():
    """Smoothing-heavy regime with CONTROLLED tail index (round 5; answers
    VERDICT r4 'the heavy-tail bench does not measure what it claims').

    Log-weights are exact GPD(sigma=1, xi=k) variates — ``w = (e^{kT}-1)/k``
    with ``T ~ Exp(1)``, computed in log space — so the PSIS tail
    exceedances are GPD with the SAME k (threshold stability), every row is
    continuous (no degenerate ties), and k-hat must land near k.  Each
    regime ASSERTS its own honesty: >=95% of rows take the full
    GPD-fit + inverse-CDF path and mean finite k-hat sits within 0.15 of
    the target (the CPU-validated estimator band at tail~=223).  Reference
    behavior being matched: /root/reference/pyloo/psis.py:139-158."""
    rows, s = CHUNK, N_DRAWS
    m = tail_length(s, 1.0)
    out = {}
    for k_true in (0.7, 1.0, 1.5):
        key = jax.random.PRNGKey(int(k_true * 10))
        t = jax.random.exponential(key, (rows, s), jnp.float32)
        kt = jnp.float32(k_true) * t
        x = kt + jnp.log1p(-jnp.exp(-kt)) - jnp.log(jnp.float32(k_true))
        _ = float(x[0, 0])

        e0, k0, n0 = _smooth_k_summary(x, jnp.float32(0.0), m)
        _ = float(e0 + k0 + n0)
        # best of 2 timed reps (distinct salts per rep: a remote tunnel can
        # serve jittered dispatches — BENCH_r05's first k=1.5 sample read 3x
        # slow on an otherwise identical program)
        dt = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            ksum = jnp.zeros((), jnp.float32)
            nfin = jnp.zeros((), jnp.float32)
            for i in range(4):
                e, kv, nf = _smooth_k_summary(
                    x, jnp.float32(4 * rep + i) * jnp.float32(1e-6), m
                )
                acc, ksum, nfin = acc + e, ksum + kv, nfin + nf
            _ = float(acc)
            dt = min(dt, (time.perf_counter() - t0) / 4)
        n_fin = float(nfin)
        mean_k = float(ksum) / max(n_fin, 1.0)
        frac_nonfinite = 1.0 - n_fin / (4 * rows)
        honest = bool(frac_nonfinite < 0.05 and abs(mean_k - k_true) < 0.15)
        if not honest:
            _stage(
                f"heavy tail k={k_true}: DISHONEST measurement"
                f" (mean_khat={mean_k:.3f}, frac_nonfinite="
                f"{frac_nonfinite:.4f}) — regime missed its target band"
            )
        out[f"k={k_true}"] = {
            "rows": rows,
            "n_draws": s,
            "target_khat": k_true,
            "mean_finite_khat": round(mean_k, 4),
            "frac_k_nonfinite": round(frac_nonfinite, 4),
            "obs_per_sec": round(rows / dt, 1),
            "measures_smoothing_path": honest,
        }
        del x, t, kt
        # land per-regime results immediately for truncated runs
        _PARTIAL["detail"]["heavy_tail_bench"] = dict(out)
    return out


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
    # best of 2 reps with distinct salts (tunnel-stall jitter guard, same
    # rationale as the f32 salted loop)
    dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float64)
        for i in range(n_iters):
            acc = acc + smooth64(
                base64[i % N_RESIDENT],
                jnp.float64(rep * n_iters + i + 1) * 1e-6,
            )
        _ = float(acc)
        dt = min(dt, time.perf_counter() - t0)
    del base64
    return dt, settle_wall


def bench_nonfactor():
    """Non-factorized MVN LOO at scale (VERDICT r4 item 8).

    The reference is O(N * N^2) per draw per observation
    (/root/reference/pyloo/loo_nonfactor.py:519-522) — ~hours at N=2048.
    This path is the batched Cholesky + rank-1 kernel
    (pyloo_tpu/ops/nonfactor.py): one factorization + triangular solve per
    draw, vmapped over the draw axis.  N=2048 observations, S=32 draws of a
    dense (N, N) covariance (f64: ~1 GB per (S, N, N) tensor).
    """
    from pyloo_tpu.ops.nonfactor import mvn_conditional_loglik
    from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast as _fast

    n, s_draws = 2048, 32
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    # well-conditioned SPD covariances: A A^T / n + 2 I, jittered per draw
    a = jax.random.normal(k1, (s_draws, n, 64), jnp.float32)
    cov = (
        jnp.einsum("sik,sjk->sij", a, a) / 64
        + 2.0 * jnp.eye(n, dtype=jnp.float32)[None]
    )
    mu = 0.1 * jax.random.normal(k2, (s_draws, n), jnp.float32)
    y = jnp.asarray(jax.random.normal(k3, (n,), jnp.float32))
    _ = float(cov[0, 0, 0]) + float(mu[0, 0]) + float(y[0])

    m_tail = tail_length(s_draws, 1.0)

    @jax.jit
    def nonfactor_loo(y_, mu_, cov_):
        ll = mvn_conditional_loglik(y_, mu_, cov=cov_)  # (S, N)
        e, k, l, _d = _fast(-ll.T.astype(jnp.float32), m_tail)
        return jnp.sum(e), jnp.max(k)

    e0, k0 = nonfactor_loo(y, mu, cov)
    _ = float(e0 + k0)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(4):
        acc = acc + nonfactor_loo(y + jnp.float32(i) * 1e-6, mu, cov)[0]
    _ = float(acc)
    dt = (time.perf_counter() - t0) / 4
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak_hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        peak_hbm_gb = None
    del a, cov, mu
    return {
        "n_obs": n,
        "n_draws": s_draws,
        "wall_s_per_call": round(dt, 3),
        "obs_per_sec": round(n / dt, 1),
        "peak_hbm_gb": peak_hbm_gb,
        "elpd_sum": round(float(e0), 1),
        "note": (
            "batched-Cholesky MVN conditional LOO; reference per-draw loop"
            " is O(N*N^2) per draw (loo_nonfactor.py:519-522)"
        ),
    }


def _load_prev_bench():
    """Newest BENCH_r*.json -> (path, parsed-result dict) or (None, None).

    The driver wraps bench.py's JSON line as the "parsed" key; accept both
    the wrapped and the bare layout.
    """
    import glob

    paths = sorted(glob.glob("BENCH_r*.json"))
    for p in reversed(paths):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = d.get("parsed") if isinstance(d, dict) else None
        if parsed is None and isinstance(d, dict) and "value" in d:
            parsed = d
        if parsed and parsed.get("value"):
            return p, parsed
    return None, None


def _regression_gate(result):
    """Compare headline + key detail metrics against the previous round's
    BENCH file; print deltas and mark any >3% drop in result["regressed"]
    (VERDICT r4 item 3: regressions must not ship unexamined)."""
    path, prev = _load_prev_bench()
    if prev is None:
        result["regressed"] = []
        return
    deltas = {}
    regressed = []

    def cmp(name, new, old, higher_is_better=True):
        if new is None or old in (None, 0):
            return
        delta = (new - old) / abs(old)
        deltas[name] = {
            "prev": old,
            "new": new,
            "delta_pct": round(100 * delta, 2),
        }
        if (delta < -0.03) if higher_is_better else (delta > 0.03):
            regressed.append(name)
        _stage(
            f"vs {path} {name}: {old} -> {new} ({100 * delta:+.1f}%)"
        )

    nd, od = result["detail"], prev.get("detail", {})
    cmp("headline_obs_per_sec", result.get("value"), prev.get("value"))
    cmp(
        "kernel_salted_loop_obs_per_sec",
        nd.get("kernel_salted_loop_obs_per_sec"),
        od.get("kernel_salted_loop_obs_per_sec"),
    )
    cmp(
        "exact_f64_obs_per_sec",
        nd.get("exact_f64_obs_per_sec"),
        od.get("exact_f64_obs_per_sec"),
    )
    # user-visible cold start = warmup + first real call (lower is better)
    new_cold = (nd.get("api_warmup_wall_s") or 0) + (
        nd.get("api_loo_streaming_cold_wall_s") or 0
    )
    old_cold = (od.get("api_warmup_wall_s") or 0) + (
        od.get("api_loo_streaming_cold_wall_s") or 0
    )
    cmp(
        "total_cold_start_wall_s",
        round(new_cold, 3) or None,
        round(old_cold, 3) or None,
        higher_is_better=False,
    )
    result["detail"]["vs_prev"] = {"file": path, "metrics": deltas}
    result["regressed"] = regressed


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
    _PARTIAL["truncated"] = True  # top-level: drivers need not dig in detail
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
    import threading

    signal.signal(signal.SIGTERM, _emit_partial)

    # Watchdog: a wedged TPU tunnel (seen round 5: the remote endpoint
    # stopped serving and every RPC blocked forever) hangs the process
    # without any exception, and a driver that SIGKILLs records nothing.
    # Emit the partial result and exit before that point.  Generous default
    # (50 min) — a fully cold axon server legitimately needs ~10 min.
    deadline = float(os.environ.get("PYLOO_BENCH_WATCHDOG_SECS", "3000"))

    def _watchdog():
        time.sleep(deadline)
        _stage(f"WATCHDOG: {deadline:.0f}s deadline hit; emitting partial")
        _emit_partial(None, None)

    threading.Thread(target=_watchdog, daemon=True).start()
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

    # best of 2 reps with distinct salts: a remote tunnel stall during one
    # rep (observed as a transient -3% in the r5 run) should not land in
    # the recorded number
    wall = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        ksum = jnp.zeros((), jnp.float32)
        for i in range(n_chunks):
            salt = jnp.float32(rep * n_chunks + i) * jnp.float32(1e-6)
            e, kv, l = smooth(base[i % N_RESIDENT], salt)
            acc = acc + e
            ksum = ksum + kv
        total = float(acc)  # single d2h fetch synchronizes everything
        wall = min(wall, time.perf_counter() - t0)
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
    _stage("heavy tail done; nonfactor MVN")
    _STAGE_NAME[0] = "nonfactor MVN"
    nonfactor = bench_nonfactor()
    _PARTIAL["detail"]["nonfactor"] = nonfactor
    _stage("nonfactor done")

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
            "nonfactor": nonfactor,
        },
    }
    _regression_gate(result)
    # the run is complete: a SIGTERM from here on must not print a SECOND
    # JSON line on stdout (ADVICE r4)
    import signal

    signal.signal(signal.SIGTERM, signal.SIG_DFL)
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
