"""Randomized differential fuzz: streaming/compact surfaces vs in-memory oracles.

Every trial draws a random shape (B, S), chunk size, reff, and log-likelihood
distribution (normal / heavy-tailed t / exponential / rounded ties /
constant rows / bimodal), then checks:

- ``loo_streaming`` == ``loo`` (elpd, pointwise, pareto_k incl. inf-k
  placement) at 1e-8,
- ``psislw_compact().densify()`` == ``psislw`` at 1e-10,
- ``waic_streaming`` == ``waic`` at 1e-8,
- ``e_loo_streaming`` (mean/sd) == ``e_loo`` at 1e-7,
- ``loo_group_streaming`` == ``loo_group`` at 1e-9.

Run: ``python scripts/fuzz_differential.py [trials] [seed]`` (defaults 40).
Exit code 1 on any mismatch.  This is a verification harness, not part of
the test suite — the suite pins fixed seeds; this sweeps random ones.
"""

import sys
import warnings

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import pyloo_tpu as pl
from pyloo_tpu.containers import DataArray as DA


def gen_ll(rng, dist, B, S):
    if dist == "normal":
        return rng.normal(-1, rng.uniform(0.1, 2), size=(B, S))
    if dist == "t":
        return -np.abs(rng.standard_t(df=rng.uniform(1.1, 5), size=(B, S)))
    if dist == "exp":
        return -rng.exponential(rng.uniform(0.5, 3), size=(B, S))
    if dist == "ties":
        return np.round(rng.normal(-1, 1, size=(B, S)), 1)
    if dist == "const-rows":
        ll = np.tile(rng.normal(-1, 1, size=(B, 1)), (1, S))
        ll[: B // 2] = rng.normal(-1, 1, size=(B // 2, S))
        return ll
    return np.where(
        rng.random((B, S)) < 0.5,
        rng.normal(-3, 0.3, size=(B, S)),
        rng.normal(-0.5, 0.3, size=(B, S)),
    )


def main(trials=40, seed=20260818):
    warnings.simplefilter("ignore")
    rng = np.random.default_rng(seed)
    dists = ["normal", "t", "exp", "ties", "const-rows", "bimodal"]
    fails = 0
    for trial in range(trials):
        if trial and trial % 5 == 0:
            # every trial compiles fresh shapes; XLA:CPU dies with an LLVM
            # "Cannot allocate memory" once hundreds of executables are live
            # (same hazard tests/conftest.py guards per-module)
            jax.clear_caches()
            pl.clear_streaming_cache()
        B = int(rng.integers(5, 120))
        S = int(rng.integers(8, 600))
        dist = dists[int(rng.integers(len(dists)))]
        ll = gen_ll(rng, dist, B, S)
        reff = float(rng.uniform(0.3, 1.0))
        chunk = int(rng.integers(4, B + 32))
        tag = f"trial {trial} dist={dist} B={B} S={S} reff={reff:.2f} chunk={chunk}"
        llj = jnp.asarray(ll)
        ll_fn = lambda i: llj[i]  # noqa: B023
        idata = pl.from_dict(log_likelihood={"obs": ll.T[None]})

        try:
            ref = pl.loo(idata, reff=reff, pointwise=True)
            got = pl.loo_streaming(
                ll_fn, B, S, reff=reff, chunk_size=chunk, pointwise=True,
                dtype=jnp.float64,
            )
            np.testing.assert_allclose(
                got["elpd_loo"], ref["elpd_loo"], rtol=1e-9
            )
            np.testing.assert_allclose(
                got.loo_i.values, np.asarray(ref.loo_i.values).ravel(),
                rtol=1e-8, atol=1e-12,
            )
            kr = np.asarray(ref.pareto_k.values).ravel()
            kg = got.pareto_k.values
            mask = np.isfinite(kr)
            np.testing.assert_allclose(
                kg[mask], kr[mask], rtol=1e-6, atol=1e-9
            )
            assert np.array_equal(np.isfinite(kg), mask)

            cw = pl.psislw_compact(-ll, reff=reff)
            lw, _ = pl.psislw(-ll, reff=reff)
            np.testing.assert_allclose(
                np.asarray(cw.densify(-ll)), np.asarray(lw),
                rtol=1e-10, atol=1e-12,
            )

            r = pl.waic_streaming(
                ll_fn, B, S, chunk_size=chunk, dtype=jnp.float64,
                pointwise=True,
            )
            wref = pl.waic(idata, pointwise=True)
            np.testing.assert_allclose(
                r["elpd_waic"], wref["elpd_waic"], rtol=1e-9
            )
            np.testing.assert_allclose(
                r.waic_i.values, np.asarray(wref.waic_i.values).ravel(),
                rtol=1e-8,
            )

            x = rng.normal(0, 1, size=(B, S))
            xj = jnp.asarray(x)
            lwm, _ = pl.psislw(-ll)
            for kind in ("mean", "sd"):
                er = pl.e_loo_streaming(
                    ll_fn, lambda i: xj[i], B, S, type=kind,  # noqa: B023
                    chunk_size=chunk, dtype=jnp.float64,
                )
                eref = pl.e_loo(
                    DA(x, ("obs", "__sample__")),
                    log_weights=DA(np.asarray(lwm), ("obs", "__sample__")),
                    log_ratios=DA(-ll, ("obs", "__sample__")),
                    type=kind,
                )
                np.testing.assert_allclose(
                    np.asarray(er.value.values).ravel(),
                    np.asarray(eref.value.values).ravel(),
                    rtol=1e-7, atol=1e-10,
                )

            gids = rng.integers(0, max(2, B // 6), size=B)
            gr = pl.loo_group_streaming(
                ll_fn, gids, B, S, chunk_size=chunk, dtype=jnp.float64
            )
            gref = pl.loo_group(idata, gids, reff=1.0)
            np.testing.assert_allclose(
                gr["elpd_logo"], gref["elpd_logo"], rtol=1e-9
            )
        except AssertionError as e:
            fails += 1
            print(f"FAIL {tag}\n{str(e)[:400]}")
    print(f"fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_nonfactor(trials=12, seed=4242):
    """Randomized MVN nonfactor check vs the brute-force partitioned-normal
    oracle (per draw, per observation), including near-singular covariances."""
    from scipy import stats

    warnings.simplefilter("ignore")
    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        if trial and trial % 4 == 0:
            jax.clear_caches()
        N = int(rng.integers(4, 26))
        C, T = 1, int(rng.integers(5, 30))
        spread = rng.uniform(0.1, 1.0)
        A = rng.normal(size=(N, N)) * spread
        base = A @ A.T + rng.uniform(0.05, 1.0) * np.eye(N)
        mu0 = rng.normal(size=N)
        y = rng.multivariate_normal(mu0, base)
        mus = mu0[None, None, :] + rng.normal(0, 0.05, size=(C, T, N))
        covs = np.empty((C, T, N, N))
        for t in range(T):
            j = rng.normal(0, 0.01, size=(N, N))
            covs[0, t] = base + (j + j.T) / 2 + 0.01 * np.eye(N)
        idata = pl.from_dict(
            posterior={"mu": mus, "cov": covs}, observed_data={"y": y}
        )
        res = pl.loo_nonfactor(idata, pointwise=True)
        # oracle: elpd_i from brute-force conditionals + public psislw
        ll = np.empty((N, T))
        for t in range(T):
            mu_t, cov_t = mus[0, t], covs[0, t]
            for i in range(N):
                keep = np.delete(np.arange(N), i)
                c22i = np.linalg.inv(cov_t[np.ix_(keep, keep)])
                c12 = cov_t[np.ix_([i], keep)]
                m = mu_t[i] + (c12 @ c22i @ (y[keep] - mu_t[keep]))[0]
                v = cov_t[i, i] - (c12 @ c22i @ c12.T)[0, 0]
                ll[i, t] = stats.norm.logpdf(y[i], m, np.sqrt(v))
        lw, _ = pl.psislw(-ll, reff=1.0)
        lw = np.asarray(lw)
        elpd_i = np.array(
            [np.logaddexp.reduce(lw[i] + ll[i]) for i in range(N)]
        )
        try:
            np.testing.assert_allclose(
                np.asarray(res.loo_i.values).ravel(), elpd_i,
                rtol=1e-6, atol=1e-9,
            )
        except AssertionError as e:
            fails += 1
            print(f"NONFACTOR FAIL trial={trial} N={N} T={T}: {str(e)[:300]}")
    print(f"nonfactor fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_fast32(trials=20, seed=999):
    """float32 fast path vs float64 exact path at loose tolerance.

    The fast path is a different kernel family (compact scatter-free PSIS);
    this sweeps random shapes/distributions checking it stays within
    float32-roundoff distance of the exact answer and never crashes.
    """
    warnings.simplefilter("ignore")
    rng = np.random.default_rng(seed)
    dists = ["normal", "t", "exp", "ties", "bimodal"]
    fails = 0
    for trial in range(trials):
        if trial and trial % 5 == 0:
            jax.clear_caches()
            pl.clear_streaming_cache()
        B = int(rng.integers(5, 160))
        S = int(rng.integers(8, 900))
        dist = dists[int(rng.integers(len(dists)))]
        ll = gen_ll(rng, dist, B, S)
        chunk = int(rng.integers(4, B + 32))
        llj64 = jnp.asarray(ll)
        llj32 = jnp.asarray(ll, jnp.float32)
        try:
            exact = pl.loo_streaming(
                lambda i: llj64[i], B, S, chunk_size=chunk,  # noqa: B023
                pointwise=True, dtype=jnp.float64,
            )
            fast = pl.loo_streaming(
                lambda i: llj32[i], B, S, chunk_size=chunk,  # noqa: B023
                pointwise=True, dtype=jnp.float32,
            )
            scale = max(abs(float(exact["elpd_loo"])), 1.0)
            diff = abs(float(fast["elpd_loo"]) - float(exact["elpd_loo"]))
            assert diff / scale < 2e-3, (
                f"elpd diff {diff:.3g} vs scale {scale:.3g}"
            )
            ke = np.asarray(exact.pareto_k.values)
            kf = np.asarray(fast.pareto_k.values)
            m = np.isfinite(ke) & np.isfinite(kf)
            if m.any():
                assert np.max(np.abs(ke[m] - kf[m])) < 0.08, (
                    f"k diff {np.max(np.abs(ke[m] - kf[m])):.3g}"
                )
        except AssertionError as e:
            fails += 1
            print(f"FAST32 FAIL trial={trial} dist={dist} B={B} S={S}: {e}")
    print(f"fast32 fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_subsample(trials=15, seed=77):
    """Streamed subsampled LOO vs in-memory loo_subsample on identical fixed
    index sets, across random shapes and all three survey estimators."""
    warnings.simplefilter("ignore")
    rng = np.random.default_rng(seed)
    ests = ["diff_srs", "srs", "hh_pps"]
    fails = 0
    for trial in range(trials):
        if trial and trial % 5 == 0:
            jax.clear_caches()
            pl.clear_streaming_cache()
        B = int(rng.integers(40, 400))
        S = int(rng.integers(10, 300))
        ll = gen_ll(rng, ["normal", "t", "exp"][int(rng.integers(3))], B, S)
        m = int(rng.integers(5, max(6, B // 2)))
        idx = np.sort(rng.choice(B, size=m, replace=False))
        est = ests[int(rng.integers(3))]
        llj = jnp.asarray(ll)
        idata = pl.from_dict(log_likelihood={"obs": ll.T[None]})
        try:
            got = pl.loo_subsample_streaming(
                lambda i: llj[i], B, S, observations=idx,  # noqa: B023
                estimator=est, dtype=jnp.float64,
            )
            ref = pl.loo_subsample(
                idata, observations=idx, estimator=est,
                loo_approximation="lpd", reff=1.0,
            )
            for key in ("elpd_loo", "se", "subsampling_SE", "p_loo"):
                np.testing.assert_allclose(
                    got[key], ref[key], rtol=1e-8, atol=1e-10,
                    err_msg=key,
                )
        except AssertionError as e:
            fails += 1
            print(f"SUBSAMPLE FAIL trial={trial} est={est} B={B} S={S}"
                  f" m={m}: {str(e)[:300]}")
    print(f"subsample fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_mesh(trials=10, seed=55):
    """Random shapes through the obs-sharded mesh (all local devices) vs the
    unsharded path.  Run with XLA_FLAGS=--xla_force_host_platform_device_count=8
    for a virtual multi-device mesh."""
    from jax.sharding import Mesh

    warnings.simplefilter("ignore")
    devs = jax.devices()
    if len(devs) < 2:
        print("mesh fuzz skipped: single device (set XLA_FLAGS="
              "--xla_force_host_platform_device_count=8)")
        return 0
    mesh = Mesh(np.asarray(devs), axis_names=("obs",))
    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        if trial and trial % 4 == 0:
            jax.clear_caches()
            pl.clear_streaming_cache()
        B = int(rng.integers(9, 300))
        S = int(rng.integers(8, 500))
        ll = gen_ll(rng, ["normal", "t", "ties"][int(rng.integers(3))], B, S)
        chunk = int(rng.integers(8, B + 64))
        llj = jnp.asarray(ll)
        try:
            sharded = pl.loo_streaming(
                lambda i: llj[i], B, S, chunk_size=chunk,  # noqa: B023
                pointwise=True, mesh=mesh, dtype=jnp.float64,
            )
            plain = pl.loo_streaming(
                lambda i: llj[i], B, S, chunk_size=chunk,  # noqa: B023
                pointwise=True, dtype=jnp.float64,
            )
            np.testing.assert_allclose(
                sharded["elpd_loo"], plain["elpd_loo"], rtol=1e-12
            )
            np.testing.assert_allclose(
                sharded.loo_i.values, plain.loo_i.values, rtol=1e-11
            )
        except AssertionError as e:
            fails += 1
            print(f"MESH FAIL trial={trial} B={B} S={S} chunk={chunk}:"
                  f" {str(e)[:300]}")
    print(f"mesh fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_lfo(trials=15, seed=31):
    """loo_lfo's batched block program vs a per-target scalar oracle.

    The oracle recomputes every target independently: ratio = plain numpy
    row sums, smoothing via the public single-row psislw, elpd via
    logsumexp — no cumulative-sum / batching machinery shared with the
    implementation under test.
    """
    warnings.simplefilter("ignore")
    rng = np.random.default_rng(seed)
    dists = ["normal", "t", "exp", "ties", "bimodal"]
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(15, 90))
        s = int(rng.integers(50, 1500))
        m_ahead = int(rng.integers(1, 4))
        L = int(rng.integers(3, max(4, n - m_ahead - 3)))
        reff = float(rng.uniform(0.5, 1.5))
        ll = gen_ll(rng, dists[trial % len(dists)], n, s)
        idata = pl.from_dict(
            log_likelihood={"obs": ll.T.reshape(1, s, n)}
        )
        try:
            res = pl.loo_lfo(
                idata, L, M=m_ahead, reff=reff, pointwise=True
            )
            got = np.asarray(res["lfo_i"].values)
            got_k = np.asarray(res["pareto_k"])
            n_targets = n - m_ahead - L + 1
            assert res["n_data_points"] == n_targets
            for t in range(n_targets):
                i = L + t
                joint = ll[i : i + m_ahead].sum(axis=0)
                if t == 0:
                    c = joint.max()
                    want = c + np.log(np.mean(np.exp(joint - c)))
                    want_k = 0.0
                else:
                    ratio = ll[L:i].sum(axis=0)
                    lw, k = pl.psislw(ratio.copy(), reff=reff)
                    x = lw + joint
                    c = x.max()
                    want = c + np.log(np.sum(np.exp(x - c)))
                    want_k = float(k)
                np.testing.assert_allclose(got[t], want, rtol=1e-9, atol=1e-9)
                if np.isfinite(want_k) or t == 0:
                    np.testing.assert_allclose(
                        got_k[t], want_k, rtol=1e-9, atol=1e-12
                    )
                else:
                    assert not np.isfinite(got_k[t])
        except AssertionError as e:
            fails += 1
            print(f"LFO FAIL trial={trial} n={n} s={s} L={L} M={m_ahead}"
                  f" reff={reff:.2f}: {str(e)[:300]}")
    print(f"lfo fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


def fuzz_mm(trials=8, seed=9001):
    """Device-batched moment matching vs the host greedy loop on random
    conjugate regressions (exact posterior draws; contaminated responses
    force high-k observations)."""
    warnings.simplefilter("ignore")
    import jax.numpy as jnp  # noqa: F811

    from pyloo_tpu.models.wrapper import Model, idata_from_flat_draws

    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        p = int(rng.integers(1, 5))
        n = int(rng.integers(12, 40))
        s = int(rng.integers(300, 900))
        X = rng.normal(size=(n, p))
        beta_true = rng.normal(size=p)
        y = X @ beta_true + rng.normal(size=n)
        n_out = int(rng.integers(1, 4))
        y[rng.choice(n, n_out, replace=False)] += rng.uniform(4, 9, n_out)

        def logp(params, data, X=X):
            b = params["beta"]
            r = data["y"] - data["X"] @ b
            return -0.5 * jnp.sum(b**2) - 0.5 * jnp.sum(r**2)

        def log_lik(params, data):
            r = data["y"] - data["X"] @ params["beta"]
            return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * r**2

        model = Model(
            f"reg{trial}", {"y": y, "X": X}, {"beta": (p,)},
            logp, log_lik, obs_keys=("y", "X"),
        )
        # exact conjugate posterior: beta | y ~ N(mu_n, Sigma_n)
        prec = np.eye(p) + X.T @ X
        cov = np.linalg.inv(prec)
        mu_n = cov @ (X.T @ y)
        chol = np.linalg.cholesky(cov)
        draws = mu_n + rng.normal(size=(s, p)) @ chol.T
        idata = idata_from_flat_draws(model, draws.reshape(1, s, p))
        wrapper = pl.JAXModelWrapper(model, idata)
        orig = pl.loo(idata, pointwise=True, reff=1.0)
        ks = np.asarray(orig.pareto_k.values)
        thresh = float(np.quantile(ks, rng.uniform(0.5, 0.9)))
        split = bool(rng.integers(0, 2))
        cov_t = bool(rng.integers(0, 2))
        try:
            host = pl.loo_moment_match(
                wrapper, orig, k_threshold=thresh, split=split, cov=cov_t,
                device_batched=False,
            )
            dev = pl.loo_moment_match(
                wrapper, orig, k_threshold=thresh, split=split, cov=cov_t,
                device_batched=True,
            )
            np.testing.assert_allclose(
                dev.loo_i.values, host.loo_i.values, rtol=1e-8, atol=1e-8
            )
            np.testing.assert_allclose(
                dev.pareto_k.values, host.pareto_k.values,
                rtol=1e-8, atol=1e-8,
            )
            np.testing.assert_allclose(
                dev["elpd_loo"], host["elpd_loo"], rtol=1e-8
            )
        except AssertionError as e:
            fails += 1
            print(f"MM FAIL trial={trial} p={p} n={n} s={s} thr={thresh:.2f}"
                  f" split={split} cov={cov_t}: {str(e)[:300]}")
    print(f"mm fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260818
    mode = sys.argv[3] if len(sys.argv) > 3 else "streaming"
    rc = 0
    if mode in ("streaming", "all"):
        rc |= main(trials, seed)
    if mode in ("nonfactor", "all"):
        rc |= fuzz_nonfactor(max(trials // 3, 4), seed)
    if mode in ("fast32", "all"):
        rc |= fuzz_fast32(trials, seed)
    if mode in ("subsample", "all"):
        rc |= fuzz_subsample(trials, seed)
    if mode in ("mesh", "all"):
        rc |= fuzz_mesh(max(trials // 3, 4), seed)
    if mode in ("lfo", "all"):
        rc |= fuzz_lfo(max(trials // 2, 5), seed)
    if mode in ("mm", "all"):
        rc |= fuzz_mm(max(trials // 5, 4), seed)
    sys.exit(rc)
