"""Real-hardware validation sweep across the library's kernel families.

The interpret-mode property battery (tests/test_selection.py::TestPallasEnvelope)
and the CPU test suite prove the kernels' *logic*; this script proves the
*compiled TPU programs* on an actual chip, across seven sections:

* ``topk`` — ``pallas_topk_desc`` values must be BITWISE equal to
  ``lax.top_k`` at every envelope boundary shape (all list heights, 1..64
  segments, ragged S/B, boundary k), under adversarial inputs (tie runs
  crossing segment boundaries, -inf rows, all-equal rows, heavy tails).
* ``prepass`` / ``multi`` — ``pallas_loo_prepass``(_multi) selection outputs
  must be bitwise equal to the XLA oracle; the fused reductions (non-tail
  mass, lppd logsumexp) must agree to float32 roundoff.
* ``exact`` — the exact emulated-f64 PSIS path (``psislw``) on the TPU vs
  the independent paper-derived NumPy oracle (tests/oracle.py) at 1e-8,
  on normal and heavy-tailed (t2) weight matrices.
* ``eloo`` — e_loo expectation kernels (weighted mean/variance/quantile) vs
  NumPy f64 oracles at 1e-8; the function-specific ``khat_batch`` diagnostic
  vs an independently compiled XLA:CPU run of the same program.
* ``nonfactor`` — batched-Cholesky MVN/MVT conditional log-likelihoods vs
  brute-force partitioned-normal / direct-formula NumPy oracles at 1e-7.
* ``mm`` — the device-batched moment-matching program (vmapped
  ``lax.while_loop``) vs the serial host greedy loop on a fitted outlier
  model: loo_i / pareto_k equal at 1e-8, split and non-split.

Writes ``TPU_VALIDATION.json`` at the repo root: one record per case with the
platform, shape, input family, and measured agreement.  Exits nonzero on any
failure.  Runs in interpret mode when no TPU is attached (recorded in the
output so CPU runs are never mistaken for hardware evidence).

Run:  python scripts/validate_pallas_tpu.py [section ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyloo_tpu.ops.lse import logsumexp  # noqa: E402
from pyloo_tpu.ops.pallas_topk import (  # noqa: E402
    multipass_parts,
    pallas_loo_prepass,
    pallas_loo_prepass_multi,
    pallas_topk_desc,
    supports,
)

# (S, k) boundary shapes — the same envelope as TestPallasEnvelope, i.e.
# every segment count, both list heights, ragged widths, boundary k.
TOPK_SHAPES = [
    (200, 1),
    (256, 191),
    (300, 255),
    (512, 256),
    (2000, 191),
    (4000, 191),     # the bench shape
    (4096, 256),
    (4097, 100),
    (8000, 270),     # 4 chains x 2000 draws -> N=512 list height
    (8192, 512),
    (16000, 191),
    (16384, 257),
    (513, 512),
    # 1024-tall list tier (k > 512, S up to 65536)
    (1025, 1024),
    (33000, 513),
    (40000, 600),
    (65536, 770),    # reff=1 PSIS tail k = 3*sqrt(65536)+1 = 769
    (65536, 1024),
]
# prepass: subset covering all list heights and 1/8/32/64 segments
PREPASS_SHAPES = [
    (256, 192),
    (2000, 192),
    (4000, 192),
    (8000, 270),
    (16000, 192),
    (40000, 608),    # 1024-tall tier
    (65536, 770),
]
# multipass prepass: S beyond one pass's 64-segment cap -> draw-axis split
MULTIPASS_SHAPES = [
    (20000, 192),    # 256-tall cap is 16384 -> 2 parts
    (100000, 608),   # 1024-tall cap is 65536 -> 2 parts
    (131072, 770),   # exact power-of-two split
    (200000, 192),   # 13 parts on the 256-tall tier
]


def _adversarial_rows(rng: np.random.Generator, b: int, s: int) -> np.ndarray:
    """Input family mixing random, tied, infinite, and heavy-tail rows."""
    x = rng.normal(size=(b, s)).astype(np.float32)
    if b >= 8 and s >= 600:
        # tie runs crossing the 256-element segment boundary, duplicated
        # at the same value in a different segment
        x[0, 200:300] = 2.0
        x[0, 500:520] = 3.0
        x[1, :] = 0.25              # all-equal row
        x[2, :] = -np.inf           # all -inf row
        x[3, : s // 2] = -np.inf    # half -inf
        x[4] = -np.abs(rng.standard_t(2, size=s)).astype(np.float32) * 3
        x[5, s - 1] = 100.0         # single dominant tail element
    return x


def _same_vals(got, want) -> bool:
    got, want = np.asarray(got), np.asarray(want)
    eq = (got == want) | (np.isneginf(got) & np.isneginf(want))
    return bool(eq.all())


def main() -> int:
    # optional argv: section names to (re)run — "topk" / "prepass" / "multi";
    # prior records for sections NOT rerun are carried over from the existing
    # TPU_VALIDATION.json so a partial rerun never drops evidence.
    kernel_of = {
        "topk": ("pallas_topk_desc",),
        "prepass": ("pallas_loo_prepass",),
        "multi": ("pallas_loo_prepass_multi",),
        "exact": ("psislw_exact_f64",),
        "eloo": (
            "weighted_mean",
            "weighted_variance",
            "weighted_quantile",
            "khat",
        ),
        "nonfactor": ("mvn_conditional", "mvt_conditional"),
        "mm": ("moment_match_device",),
    }
    sections = set(sys.argv[1:]) or set(kernel_of)
    unknown = sections - set(kernel_of)
    if unknown:
        raise SystemExit(f"unknown sections: {sorted(unknown)}")
    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu", "axon")
    rng = np.random.default_rng(20260818)
    records = []
    ok = True
    try:
        with open("TPU_VALIDATION.json") as f:
            prior = json.load(f)
        keep = {
            name
            for s, names in kernel_of.items()
            if s not in sections
            for name in names
        }
        for r in prior.get("cases", []):
            if r.get("kernel") in keep:
                records.append(r)
                ok &= bool(r.get("pass", r.get("vals_bitwise_equal", False)))
    except (OSError, json.JSONDecodeError, KeyError):
        pass

    for s, k in TOPK_SHAPES if "topk" in sections else []:
        assert supports(s, k), (s, k)
        for b in (9, 1024):
            x = jnp.asarray(_adversarial_rows(rng, b, s))
            t0 = time.perf_counter()
            got = pallas_topk_desc(x, k, interpret=interpret)
            got.block_until_ready()
            wall = time.perf_counter() - t0
            want = jax.lax.top_k(x, k)[0]
            exact = _same_vals(got, want)
            ok &= exact
            records.append(
                {
                    "kernel": "pallas_topk_desc",
                    "s": s,
                    "k": k,
                    "b": b,
                    "vals_bitwise_equal": exact,
                    "wall_s_incl_compile": round(wall, 3),
                }
            )
            print(f"topk   S={s:6d} k={k:3d} B={b:5d} exact={exact} ({wall:.1f}s)")

    floor = float(np.log(np.finfo(np.float64).tiny))
    for s, k in PREPASS_SHAPES if "prepass" in sections else []:
        for b in (16, 2048):
            ll = rng.normal(-1, 0.8, size=(b, s))
            ll[min(3, b - 1)] = -np.abs(rng.standard_t(2, size=s)) * 3
            x_raw = jnp.asarray(-ll, jnp.float32)
            t0 = time.perf_counter()
            vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass(
                x_raw, k, interpret=interpret
            )
            log_sum_ll.block_until_ready()
            wall = time.perf_counter() - t0
            C = jnp.max(x_raw, axis=1)
            xs = x_raw - C[:, None]
            want_vals = jax.lax.top_k(xs, k)[0]
            xc = jnp.maximum(want_vals[:, k - 1], floor)
            mask = xs <= xc[:, None]
            want_ntl = xc + jnp.log(
                jnp.sum(jnp.where(mask, jnp.exp(xs - xc[:, None]), 0.0), axis=1)
            )
            want_lppd = logsumexp(-x_raw, axis=1)
            vals_exact = _same_vals(vals, want_vals) and _same_vals(c1, C)
            ntl_err = float(
                np.max(np.abs(np.asarray(log_ntl) - np.asarray(want_ntl)))
            )
            lppd_err = float(
                np.max(np.abs(np.asarray(log_sum_ll) - np.asarray(want_lppd)))
            )
            passed = vals_exact and ntl_err < 1e-4 and lppd_err < 1e-4
            ok &= passed
            records.append(
                {
                    "kernel": "pallas_loo_prepass",
                    "s": s,
                    "k": k,
                    "b": b,
                    "vals_bitwise_equal": vals_exact,
                    "log_ntl_max_abs_err": ntl_err,
                    "lppd_max_abs_err": lppd_err,
                    "pass": passed,
                    "wall_s_incl_compile": round(wall, 3),
                }
            )
            print(
                f"prepass S={s:6d} k={k:3d} B={b:5d} exact={vals_exact} "
                f"ntl_err={ntl_err:.2e} lppd_err={lppd_err:.2e} ({wall:.1f}s)"
            )

    eps32 = float(np.finfo(np.float32).eps)
    for s, k in MULTIPASS_SHAPES if "multi" in sections else []:
        parts = multipass_parts(s, k)
        assert parts and parts > 1, (s, k, parts)
        for b in (16, 512):
            ll = rng.normal(-1, 0.8, size=(b, s))
            ll[min(3, b - 1)] = -np.abs(rng.standard_t(2, size=s)) * 3
            x_raw = jnp.asarray(-ll, jnp.float32)
            # conditioning-aware tolerance: parts without the global max
            # rebase by (C_p - C) — one extra f32 rounding whose ABSOLUTE
            # size scales with the data magnitude (the adversarial t(2)
            # rows reach |x| in the thousands at these S), exactly like any
            # f32 logsumexp over large-magnitude data.  Bound: a few ulps
            # at the row scale.
            scale = max(1.0, float(np.max(np.abs(ll))))
            tol = 8.0 * eps32 * scale
            t0 = time.perf_counter()
            vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass_multi(
                x_raw, k, parts=parts, interpret=interpret
            )
            log_sum_ll.block_until_ready()
            wall = time.perf_counter() - t0
            C = jnp.max(x_raw, axis=1)
            xs = x_raw - C[:, None]
            want_vals = jax.lax.top_k(xs, k)[0]
            # parts without the global max rebase by (C_p - C): one extra
            # f32 rounding vs the oracle's direct x - C -> close, not bitwise
            vals_err = float(np.max(np.abs(np.asarray(vals - want_vals))))
            xc = jnp.maximum(want_vals[:, k - 1], floor)
            want_ntl_mass = jnp.sum(
                jnp.where(xs <= xc[:, None], jnp.exp(xs), 0.0), axis=1
            )
            ntl_err = float(
                np.max(
                    np.abs(np.asarray(jnp.exp(log_ntl)) - np.asarray(want_ntl_mass))
                    / np.maximum(np.asarray(want_ntl_mass), 1e-30)
                )
            )
            want_lppd = logsumexp(-x_raw, axis=1)
            lppd_err = float(
                np.max(np.abs(np.asarray(log_sum_ll) - np.asarray(want_lppd)))
            )
            c_exact = _same_vals(c1, C)
            passed = (
                c_exact and vals_err < tol and ntl_err < tol and lppd_err < tol
            )
            ok &= passed
            records.append(
                {
                    "kernel": "pallas_loo_prepass_multi",
                    "s": s,
                    "k": k,
                    "b": b,
                    "parts": parts,
                    "c_bitwise_equal": c_exact,
                    "vals_max_abs_err": vals_err,
                    "ntl_mass_max_rel_err": ntl_err,
                    "lppd_max_abs_err": lppd_err,
                    "data_scale": round(scale, 1),
                    "ulp_tol": tol,
                    "pass": passed,
                    "wall_s_incl_compile": round(wall, 3),
                }
            )
            print(
                f"multi  S={s:6d} k={k:4d} B={b:5d} parts={parts} pass={passed} "
                f"vals_err={vals_err:.2e} ntl_err={ntl_err:.2e} "
                f"lppd_err={lppd_err:.2e} ({wall:.1f}s)"
            )

    # ---- exact emulated-f64 PSIS path vs the paper-derived host oracle ----
    if "exact" in sections:
        from pyloo_tpu.psis import psislw  # noqa: E402
        from tests.oracle import psis_matrix  # noqa: E402

        for b, s in [(64, 1000), (32, 4000), (16, 8000)]:
            lw_np = rng.normal(0.0, 1.0, size=(b, s))
            # heavy-tailed rows exercise the smoothing-heavy branch
            lw_np[: b // 4] = rng.standard_t(2, size=(b // 4, s)) * 2.0
            t0 = time.perf_counter()
            lw_got, k_got = psislw(jnp.asarray(lw_np, jnp.float64))
            lw_got = np.asarray(lw_got)
            k_got = np.asarray(k_got)
            wall = time.perf_counter() - t0
            lw_want, k_want = psis_matrix(lw_np)
            lw_err = float(np.max(np.abs(lw_got - lw_want)))
            fin = np.isfinite(k_want)
            k_err = float(np.max(np.abs(k_got[fin] - k_want[fin]))) if fin.any() else 0.0
            inf_match = bool(np.array_equal(np.isfinite(k_got), fin))
            passed = lw_err < 1e-8 and k_err < 1e-8 and inf_match
            ok &= passed
            records.append(
                {
                    "kernel": "psislw_exact_f64",
                    "s": s,
                    "b": b,
                    "lw_max_abs_err": lw_err,
                    "k_max_abs_err": k_err,
                    "inf_mask_equal": inf_match,
                    "pass": passed,
                    "wall_s_incl_compile": round(wall, 3),
                }
            )
            print(
                f"exact  S={s:6d} B={b:5d} pass={passed} "
                f"lw_err={lw_err:.2e} k_err={k_err:.2e} ({wall:.1f}s)"
            )

    # ---- e_loo expectation kernels vs NumPy f64 oracles ----
    if "eloo" in sections:
        from pyloo_tpu.ops.expectations import (  # noqa: E402
            khat_batch,
            weighted_mean_batch,
            weighted_quantile_batch,
            weighted_variance_batch,
        )

        probs = np.array([0.1, 0.5, 0.9])
        for b, s in [(128, 1000), (32, 4000)]:
            x = rng.normal(size=(b, s))
            lw = rng.standard_t(3, size=(b, s)) * 0.7
            xd = jnp.asarray(x, jnp.float64)
            lwd = jnp.asarray(lw, jnp.float64)
            t0 = time.perf_counter()
            m_got = np.asarray(weighted_mean_batch(xd, lwd))
            v_got = np.asarray(weighted_variance_batch(xd, lwd))
            q_got = np.asarray(weighted_quantile_batch(xd, lwd, jnp.asarray(probs)))
            k_got = np.asarray(khat_batch(xd, lwd, tail_len=20))
            wall = time.perf_counter() - t0

            # independent host-arithmetic oracles (f64)
            mx = lw.max(axis=1, keepdims=True)
            w = np.exp(lw - mx)
            w /= w.sum(axis=1, keepdims=True)
            m_want = (w * x).sum(axis=1)
            msq = (w * x**2).sum(axis=1)
            wss = (w**2).sum(axis=1)
            v_want = np.maximum((msq - m_want**2) / (1.0 - wss), 0.0)
            # kernel semantics (reference e_loo.py:518-531): rows where one
            # weight dominates (sum w^2 ~ 1) or x is constant return 0
            v_want = np.where(np.isclose(wss, 1.0), 0.0, v_want)
            order = np.argsort(x, axis=1)
            xs_np = np.take_along_axis(x, order, axis=1)
            cw = np.cumsum(np.take_along_axis(w, order, axis=1), axis=1)
            cw /= cw[:, -1:]
            q_want = np.empty((b, len(probs)))
            for j, p in enumerate(probs):
                wi = np.argmax(cw >= p, axis=1)
                lo = np.maximum(wi - 1, 0)
                rows = np.arange(b)
                x_hi, x_lo = xs_np[rows, wi], xs_np[rows, lo]
                w_hi, w_lo = cw[rows, wi], cw[rows, lo]
                denom = np.where(w_hi == w_lo, 1.0, w_hi - w_lo)
                q_want[:, j] = np.where(
                    wi == 0, xs_np[:, 0], x_lo + (x_hi - x_lo) * (p - w_lo) / denom
                )
            # khat: independently compiled XLA:CPU program as the oracle
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                k_want = np.asarray(
                    khat_batch(
                        jnp.asarray(x, jnp.float64),
                        jnp.asarray(lw, jnp.float64),
                        tail_len=20,
                    )
                )
            errs = {
                "weighted_mean": float(np.max(np.abs(m_got - m_want))),
                "weighted_variance": float(np.max(np.abs(v_got - v_want))),
                "weighted_quantile": float(np.max(np.abs(q_got - q_want))),
                "khat": float(np.max(np.abs(k_got - k_want))),
            }
            for name, err in errs.items():
                passed = err < 1e-8
                ok &= passed
                records.append(
                    {
                        "kernel": name,
                        "s": s,
                        "b": b,
                        "max_abs_err": err,
                        "oracle": "xla_cpu" if name == "khat" else "numpy_f64",
                        "pass": passed,
                        "wall_s_incl_compile": round(wall, 3),
                    }
                )
                print(f"eloo   {name:18s} S={s:6d} B={b:4d} err={err:.2e} pass={passed}")

    # ---- nonfactor MVN/MVT conditionals vs brute-force oracles ----
    if "nonfactor" in sections:
        from scipy import stats  # noqa: E402
        from scipy.special import gammaln  # noqa: E402

        from pyloo_tpu.ops.nonfactor import (  # noqa: E402
            mvn_conditional_loglik,
            mvt_conditional_loglik,
        )

        for n_obs, n_draws in [(12, 5), (48, 4)]:
            A = rng.normal(size=(n_obs, n_obs)) * 0.3
            base_cov = A @ A.T + np.eye(n_obs)
            mu = rng.normal(size=n_obs)
            y = rng.multivariate_normal(mu, base_cov)
            mus = mu[None, :] + rng.normal(0, 0.05, size=(n_draws, n_obs))
            covs = np.empty((n_draws, n_obs, n_obs))
            for d in range(n_draws):
                j = rng.normal(0, 0.01, size=(n_obs, n_obs))
                covs[d] = base_cov + (j + j.T) / 2 + 0.01 * np.eye(n_obs)

            t0 = time.perf_counter()
            mvn_got = np.asarray(mvn_conditional_loglik(y, mus, cov=covs))
            df = 5.0 + 5.0 * np.arange(n_draws)
            mvt_got = np.asarray(mvt_conditional_loglik(y, mus, df, cov=covs))
            wall = time.perf_counter() - t0

            mvn_want = np.empty((n_draws, n_obs))
            mvt_want = np.empty((n_draws, n_obs))
            for d in range(n_draws):
                P = np.linalg.inv(covs[d])
                r = y - mus[d]
                g = P @ r
                cbar = np.diag(P)
                for i in range(n_obs):
                    keep = np.delete(np.arange(n_obs), i)
                    c22i = np.linalg.inv(covs[d][np.ix_(keep, keep)])
                    c12 = covs[d][np.ix_([i], keep)]
                    cm = mus[d][i] + (c12 @ c22i @ (y[keep] - mus[d][keep]))[0]
                    cv = covs[d][i, i] - (c12 @ c22i @ c12.T)[0, 0]
                    mvn_want[d, i] = stats.norm.logpdf(y[i], cm, np.sqrt(cv))
                    Pmm = P[np.ix_(keep, keep)]
                    pcol = P[keep, i]
                    eff = Pmm - np.outer(pcol, pcol) / P[i, i]
                    beta = r[keep] @ eff @ r[keep]
                    cond_df = df[d] + n_obs - 1
                    cond_loc = y[i] - g[i] / cbar[i]
                    cond_scale = (df[d] + beta) / cond_df / cbar[i]
                    mvt_want[d, i] = (
                        gammaln((cond_df + 1) / 2)
                        - gammaln(cond_df / 2)
                        - 0.5 * np.log(cond_df * np.pi * cond_scale)
                        - ((cond_df + 1) / 2)
                        * np.log(1 + (y[i] - cond_loc) ** 2 / (cond_scale * cond_df))
                    )
            for name, got, want in [
                ("mvn_conditional", mvn_got, mvn_want),
                ("mvt_conditional", mvt_got, mvt_want),
            ]:
                err = float(np.max(np.abs(got - want)))
                passed = err < 1e-7
                ok &= passed
                records.append(
                    {
                        "kernel": name,
                        "n_obs": n_obs,
                        "n_draws": n_draws,
                        "max_abs_err": err,
                        "oracle": "partitioned_brute_force",
                        "pass": passed,
                        "wall_s_incl_compile": round(wall, 3),
                    }
                )
                print(
                    f"nonfac {name:16s} N={n_obs:3d} S={n_draws} "
                    f"err={err:.2e} pass={passed}"
                )

    # ---- device-batched moment matching vs the serial host loop ----
    if "mm" in sections:
        import warnings  # noqa: E402

        import pyloo_tpu as pl  # noqa: E402
        from pyloo_tpu.models.wrapper import Model, fit  # noqa: E402

        y = rng.normal(1.0, 1.0, size=30)
        y[0] = 8.5  # one gross outlier -> high pareto_k -> moment matching

        def logp(p, d):
            sd = jnp.exp(p["log_s"])
            r = (d["y"] - p["mu"]) / sd
            return (
                -0.5 * (p["mu"] / 10) ** 2
                - 0.5 * (p["log_s"] / 2) ** 2
                + jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - p["log_s"] - 0.5 * r**2)
            )

        def ll(p, d):
            sd = jnp.exp(p["log_s"])
            r = (d["y"] - p["mu"]) / sd
            return -0.5 * jnp.log(2 * jnp.pi) - p["log_s"] - 0.5 * r**2

        model = Model(
            "ls", {"y": y}, {"mu": (), "log_s": ()}, logp, ll, obs_keys=("y",)
        )
        for split in (False, True):
            t0 = time.perf_counter()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                idata = fit(model, draws=500, tune=500, chains=2, seed=7)
                wrapper = pl.JAXModelWrapper(model, idata)
                orig = pl.loo(idata, pointwise=True, reff=1.0)
                mm_host = pl.loo_moment_match(
                    wrapper, orig, split=split, cov=True, device_batched=False
                )
                mm_dev = pl.loo_moment_match(
                    wrapper, orig, split=split, cov=True, device_batched=True
                )
            wall = time.perf_counter() - t0
            loo_err = float(
                np.max(np.abs(mm_dev.loo_i.values - mm_host.loo_i.values))
            )
            k_err = float(
                np.max(np.abs(mm_dev.pareto_k.values - mm_host.pareto_k.values))
            )
            improved = float(np.max(mm_dev.pareto_k.values)) < float(
                np.max(orig.pareto_k.values)
            )
            passed = loo_err < 1e-8 and k_err < 1e-8 and improved
            ok &= passed
            records.append(
                {
                    "kernel": "moment_match_device",
                    "split": split,
                    "n_obs": 30,
                    "n_draws": 1000,
                    "loo_i_max_abs_err": loo_err,
                    "pareto_k_max_abs_err": k_err,
                    "max_k_improved": improved,
                    "oracle": "host_greedy_loop",
                    "pass": passed,
                    "wall_s_incl_compile": round(wall, 3),
                }
            )
            print(
                f"mm     split={split!s:5s} loo_err={loo_err:.2e} "
                f"k_err={k_err:.2e} improved={improved} pass={passed} ({wall:.1f}s)"
            )

    out = {
        "platform": platform,
        "interpret_mode": interpret,
        "device": str(jax.devices()[0]),
        "all_pass": ok,
        "n_cases": len(records),
        "cases": records,
    }
    with open("TPU_VALIDATION.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{'PASS' if ok else 'FAIL'}: {len(records)} cases on {platform} "
          f"(interpret={interpret}) -> TPU_VALIDATION.json")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
