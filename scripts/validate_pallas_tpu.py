"""Real-hardware validation sweep for the Pallas selection/prepass kernels.

The interpret-mode property battery (tests/test_selection.py::TestPallasEnvelope)
proves the kernel's *logic*; this script proves the *compiled Mosaic program*
on an actual TPU chip, across the same envelope boundaries:

* ``pallas_topk_desc`` values must be BITWISE equal to ``lax.top_k`` at every
  boundary shape (both per-lane list heights, 1..64 segments, ragged S/B,
  k at {1, 255, 256, 257, 512}), under adversarial inputs (tie runs crossing
  segment boundaries, -inf rows, all-equal rows, heavy tails).
* ``pallas_loo_prepass`` selection outputs (vals, row max) must be bitwise
  equal to the XLA oracle; the fused reductions (non-tail mass, lppd
  logsumexp) must agree to float32 roundoff (rtol 2e-6).

Writes ``TPU_VALIDATION.json`` at the repo root: one record per case with the
platform, shape, input family, and measured agreement.  Exits nonzero on any
failure.  Runs in interpret mode when no TPU is attached (recorded in the
output so CPU runs are never mistaken for hardware evidence).

Run:  python scripts/validate_pallas_tpu.py
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
    sections = set(sys.argv[1:]) or {"topk", "prepass", "multi"}
    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu", "axon")
    rng = np.random.default_rng(20260818)
    records = []
    ok = True
    kernel_of = {
        "topk": "pallas_topk_desc",
        "prepass": "pallas_loo_prepass",
        "multi": "pallas_loo_prepass_multi",
    }
    try:
        with open("TPU_VALIDATION.json") as f:
            prior = json.load(f)
        keep = {kernel_of[s] for s in kernel_of if s not in sections}
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
