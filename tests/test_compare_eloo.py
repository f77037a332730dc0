"""Tests for loo_compare weights and e_loo weighted expectations."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def datasets():
    return {
        "centered": pl.load_example_data("centered_eight"),
        "non_centered": pl.load_example_data("non_centered_eight"),
    }


@pytest.fixture(scope="module")
def compare_df(datasets):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return pl.loo_compare(datasets)


class TestLooCompare:
    def test_ranking_and_weights(self, compare_df):
        df = compare_df
        assert list(df.index) == ["non_centered", "centered"]
        assert df.loc["non_centered", "rank"] == 0
        assert df.loc["non_centered", "weight"] > 0.99
        assert df.loc["centered", "weight"] < 0.01
        assert df.loc["non_centered", "elpd_diff"] == 0
        assert df.loc["centered", "elpd_diff"] < 0
        assert df.loc["centered", "dse"] > 0

    def test_stacking_device_matches_scipy(self, datasets, rng):
        import warnings

        from pyloo_tpu.compare import _calculate_ics, _stacking_weights

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            elpds, scale, ic = _calculate_ics(dict(datasets), scale="log", ic="loo")
        ws = _stacking_weights(elpds, "loo", "log", solver="scipy")
        wd = _stacking_weights(elpds, "loo", "log", solver="device")
        for name in ws:
            assert abs(ws[name] - wd[name]) < 1e-6

    def test_stacking_em_known_optimum(self, rng):
        # two interior models: optimum solvable by scipy, EM must agree
        from scipy import optimize

        from pyloo_tpu.ops.stacking import stacking_weights_em

        elpd = rng.normal(-1, 0.5, size=(500, 3))
        w_em = np.asarray(stacking_weights_em(elpd))
        exp_e = np.exp(elpd - elpd.max(axis=1, keepdims=True))

        def neg(wfree):
            w = np.concatenate([wfree, [1 - wfree.sum()]])
            return -np.sum(np.log(exp_e @ w))

        res = optimize.minimize(
            neg, np.array([1 / 3, 1 / 3]),
            bounds=[(0, 1)] * 2,
            constraints=[{"type": "ineq", "fun": lambda x: 1 - x.sum()}],
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 3000},
        )
        w_ref = np.concatenate([res.x, [1 - res.x.sum()]])
        assert_allclose(w_em, w_ref, atol=2e-5)
        assert abs(w_em.sum() - 1) < 1e-12

    def test_bb_pseudo_bma(self, datasets):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = pl.loo_compare(datasets, method="bb-pseudo-bma", seed=42)
            df2 = pl.loo_compare(datasets, method="bb-pseudo-bma", seed=42)
        assert_allclose(df["weight"].values, df2["weight"].values)  # deterministic
        assert abs(df["weight"].sum() - 1) < 1e-12
        assert np.all(df["se"].values > 0)

    def test_pseudo_bma_softmax(self, datasets):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = pl.loo_compare(datasets, method="pseudo-bma")
            elpds = df[df.columns[1]].values
        expected = np.exp(elpds - elpds.max())
        expected /= expected.sum()
        assert_allclose(df["weight"].values, expected, rtol=1e-10)

    def test_precomputed_elpd_inputs(self, datasets):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            e1 = pl.loo(datasets["centered"], pointwise=True)
            e2 = pl.loo(datasets["non_centered"], pointwise=True)
            df = pl.loo_compare({"centered": e1, "non_centered": e2})
        assert df.loc["non_centered", "rank"] == 0

    def test_precomputed_requires_pointwise(self, datasets):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            e1 = pl.loo(datasets["centered"])  # not pointwise
            e2 = pl.loo(datasets["non_centered"], pointwise=True)
        with pytest.raises(ValueError, match="pointwise=True"):
            pl.loo_compare({"centered": e1, "non_centered": e2})

    def test_validation(self, datasets):
        with pytest.raises(TypeError, match="dictionary"):
            pl.loo_compare([1, 2])
        with pytest.raises(ValueError, match="at least two"):
            pl.loo_compare({"only": datasets["centered"]})
        with pytest.raises(ValueError, match="Method must be"):
            pl.loo_compare(datasets, method="bogus")
        with pytest.raises(ValueError, match="ic must be"):
            pl.loo_compare(datasets, ic="bogus")

    def test_waic_comparison(self, datasets):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = pl.loo_compare(datasets, ic="waic")
        assert "elpd_waic" in df.columns and "p_waic" in df.columns


class TestELoo:
    @pytest.fixture(scope="class")
    def setup(self):
        idata = pl.load_example_data("centered_eight")
        ll = idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        lw, k = pl.psislw(-ll, reff=1.0)
        # h(theta): posterior theta draws per school
        theta = idata.posterior.theta.stack(__sample__=("chain", "draw"))
        return theta, lw, -ll

    def test_weighted_mean(self, setup):
        theta, lw, lr = setup
        res = pl.e_loo(theta, log_weights=lw, log_ratios=lr, type="mean")
        w = np.exp(lw.values)
        w = w / w.sum(axis=1, keepdims=True)
        expected = (w * theta.values).sum(axis=1)
        assert_allclose(res.value.values, expected, rtol=1e-10)
        assert res.pareto_k.values.shape == (8,)
        assert np.all(np.isfinite(res.pareto_k.values))
        assert np.all(res.min_ss.values >= 1)
        assert np.all(res.convergence_rate.values <= 1)

    def test_weighted_variance_sd(self, setup):
        theta, lw, lr = setup
        var = pl.e_loo(theta, log_weights=lw, log_ratios=lr, type="variance")
        sd = pl.e_loo(theta, log_weights=lw, log_ratios=lr, type="sd")
        assert_allclose(sd.value.values, np.sqrt(var.value.values), rtol=1e-12)
        w = np.exp(lw.values)
        w = w / w.sum(axis=1, keepdims=True)
        x = theta.values
        mean = (w * x).sum(axis=1)
        meansq = (w * x**2).sum(axis=1)
        expected = (meansq - mean**2) / (1 - (w**2).sum(axis=1))
        assert_allclose(var.value.values, np.maximum(expected, 0), rtol=1e-9)

    def test_weighted_quantiles(self, setup):
        theta, lw, lr = setup
        res = pl.e_loo(
            theta, log_weights=lw, type="quantile", probs=[0.25, 0.5, 0.75]
        )
        assert res.value.dims == ("school", "quantile")
        vals = res.value.values
        assert np.all(np.diff(vals, axis=1) >= 0)  # monotone in prob
        # uniform weights degenerate check: median close to plain median
        uniform = pl.DataArray(
            np.zeros_like(lw.values), lw.dims, dict(lw.coords)
        )
        res_u = pl.e_loo(theta, log_weights=uniform, type="quantile", probs=0.5)
        medians = np.median(theta.values, axis=1)
        assert_allclose(res_u.value.values[:, 0], medians, atol=0.02)

    def test_quantile_validation(self, setup):
        theta, lw, _ = setup
        with pytest.raises(ValueError, match="probs must be provided"):
            pl.e_loo(theta, log_weights=lw, type="quantile")
        with pytest.raises(ValueError, match="between 0 and 1"):
            pl.e_loo(theta, log_weights=lw, type="quantile", probs=[0.0, 1.5])
        with pytest.raises(ValueError, match="type must be"):
            pl.e_loo(theta, log_weights=lw, type="bogus")
        with pytest.raises(ValueError, match="Either weights or log_weights"):
            pl.e_loo(theta, type="mean")

    def test_weights_vs_log_weights(self, setup):
        theta, lw, lr = setup
        w_da = pl.DataArray(np.exp(lw.values), lw.dims, dict(lw.coords))
        r1 = pl.e_loo(theta, weights=w_da, type="mean")
        r2 = pl.e_loo(theta, log_weights=lw, type="mean")
        assert_allclose(r1.value.values, r2.value.values, rtol=1e-12)

    def test_khat_heavy_tail_detection(self, rng):
        # heavy-tailed ratios should produce clearly larger k than light tails
        light = rng.normal(size=(4, 2000))
        heavy = rng.standard_t(df=1.5, size=(4, 2000)) * 3
        k_light = pl.compute_pareto_k(None, light)
        k_heavy = pl.compute_pareto_k(None, heavy)
        assert np.mean(k_heavy) > np.mean(k_light)

    def test_k_hat_scalar_path(self, rng):
        lr = rng.normal(size=1000)
        x = rng.normal(size=1000)
        k = pl.k_hat(x, lr)
        assert np.isfinite(k)
        k_none = pl.k_hat(None, lr)
        assert np.isfinite(k_none)
        with pytest.raises(ValueError, match="tail_len"):
            pl.compute_pareto_k(None, lr, tail_len=3)

    def test_inference_data_path(self):
        idata = pl.load_example_data("centered_eight")
        ll = idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        lw, _ = pl.psislw(-ll, reff=1.0)
        res = pl.e_loo(idata, group="posterior", var_name="theta", log_weights=lw)
        assert res.value.values.shape == (8,)


class TestELooBroadcast:
    def test_scalar_parameter_broadcasts_over_observations(self, rng):
        mu = rng.normal(size=(2, 300))
        lw = rng.normal(size=(6, 600))
        lw -= np.log(np.exp(lw).sum(1, keepdims=True))
        idata = pl.from_dict(
            posterior={"mu": mu},
            log_likelihood={"obs": rng.normal(size=(2, 300, 6))},
        )
        res = pl.e_loo(
            idata, group="posterior", var_name="mu",
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
        )
        manual = (np.exp(lw) * mu.reshape(1, -1)).sum(1)
        assert_allclose(np.asarray(res.value.values), manual, rtol=1e-12)
        assert res.value.values.shape == (6,)

    def test_draw_count_mismatch_rejected(self):
        with pytest.raises(ValueError, match="draws"):
            pl.e_loo(
                pl.DataArray(np.zeros((1, 100)), ("obs", "__sample__")),
                log_weights=pl.DataArray(
                    np.zeros((5, 200)), ("obs", "__sample__")
                ),
            )


class TestELooBreadth:
    """Additional e_loo behaviors from the reference battery
    (``test_e_loo.py``): constant values, extreme weights, eight-schools
    end-to-end, error paths, numerical stability."""

    @pytest.fixture(scope="class")
    def eight(self):
        c = pl.load_example_data("centered_eight")
        ll = c.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            lw, k = pl.psislw(-ll, reff=1.0)
        values = c.posterior.theta.stack(__sample__=("chain", "draw"))
        return values, lw, k

    def test_eight_schools_all_types(self, eight):
        values, lw, k = eight
        for typ in ("mean", "variance", "sd"):
            r = pl.e_loo(values, log_weights=lw, type=typ)
            assert r.value.values.shape == (8,)
            assert np.all(np.isfinite(r.value.values))
            if typ in ("variance", "sd"):
                assert np.all(r.value.values > 0)
        q = pl.e_loo(
            values, log_weights=lw, type="quantile", probs=[0.1, 0.5, 0.9]
        )
        vq = q.value.values
        assert vq.shape[0] == 3 or vq.shape[-1] == 3
        qm = np.moveaxis(vq, 0, -1) if vq.shape[0] == 3 else vq
        assert np.all(qm[..., 0] <= qm[..., 1])
        assert np.all(qm[..., 1] <= qm[..., 2])

    def test_constant_values(self, eight):
        values, lw, k = eight
        const = pl.DataArray(
            np.full(values.values.shape, 3.25),
            values.dims,
            dict(values.coords.items()),
            "c",
        )
        r = pl.e_loo(const, log_weights=lw, type="mean")
        assert_allclose(r.value.values, 3.25, rtol=1e-12)
        rv = pl.e_loo(const, log_weights=lw, type="variance")
        assert_allclose(rv.value.values, 0.0, atol=1e-9)

    def test_extreme_weights(self, rng):
        # one draw dominates: expectation collapses to that draw's value
        S, N = 500, 4
        lw = np.full((N, S), -np.log(S))
        lw[:, 0] = 30.0
        lw = lw - np.log(np.sum(np.exp(lw - lw.max(axis=1, keepdims=True)),
                                axis=1, keepdims=True)) - lw.max(axis=1, keepdims=True)
        x = rng.normal(size=(N, S))
        vals = pl.DataArray(x, ("obs", "__sample__"), {}, "x")
        lw_da = pl.DataArray(lw, ("obs", "__sample__"), {}, "lw")
        r = pl.e_loo(vals, log_weights=lw_da, type="mean")
        assert_allclose(r.value.values, x[:, 0], atol=1e-6)

    def test_error_paths(self, eight):
        values, lw, k = eight
        with pytest.raises((ValueError, TypeError)):
            pl.e_loo(values, log_weights=lw, type="median")  # invalid type
        with pytest.raises((ValueError, TypeError)):
            pl.e_loo(values, log_weights=lw, type="quantile")  # missing probs
        with pytest.raises((ValueError, TypeError)):
            pl.e_loo(
                values, log_weights=lw, type="quantile", probs=[0.0, 1.5]
            )

    def test_numerical_stability_large_values(self, eight):
        values, lw, k = eight
        big = pl.DataArray(
            values.values * 1e12,
            values.dims,
            dict(values.coords.items()),
            "big",
        )
        r = pl.e_loo(big, log_weights=lw, type="mean")
        assert np.all(np.isfinite(r.value.values))
        small = pl.DataArray(
            values.values * 1e-12,
            values.dims,
            dict(values.coords.items()),
            "small",
        )
        r2 = pl.e_loo(small, log_weights=lw, type="sd")
        assert np.all(np.isfinite(r2.value.values))

    def test_weights_equal_log_weights_path(self, eight):
        values, lw, k = eight
        w = np.exp(lw.values)
        w_da = pl.DataArray(w, lw.dims, dict(lw.coords.items()), "w")
        r_w = pl.e_loo(values, weights=w_da, type="mean")
        r_lw = pl.e_loo(values, log_weights=lw, type="mean")
        assert_allclose(r_w.value.values, r_lw.value.values, rtol=1e-10)


def test_khat_short_draws_regression():
    """S < tail_len must use every available draw (reference e_loo.py:352
    slice semantics), not crash in top_k; S too short for 5 positive
    exceedances returns inf.  Found by scripts/fuzz_differential.py."""
    import warnings

    import jax.numpy as jnp

    import pyloo_tpu as pl
    from pyloo_tpu.containers import DataArray as DA

    rng = np.random.default_rng(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for S, expect_finite in ((2, False), (5, False), (9, True)):
            ll = rng.normal(-1, 1, size=(11, S))
            x = rng.normal(0, 1, size=(11, S))
            lw, _ = pl.psislw(-ll)
            r = pl.e_loo(
                DA(x, ("obs", "__sample__")),
                log_weights=DA(np.asarray(lw), ("obs", "__sample__")),
                log_ratios=DA(-ll, ("obs", "__sample__")),
                type="mean",
            )
            ks = np.asarray(r.pareto_k.values)
            assert np.isfinite(ks).all() == expect_finite, (S, ks)
            llj, xj = jnp.asarray(ll), jnp.asarray(x)
            rs = pl.e_loo_streaming(
                lambda i: llj[i], lambda i: xj[i], 11, S, type="mean",
                chunk_size=8, dtype=jnp.float64,
            )
            np.testing.assert_allclose(
                rs.value.values, np.asarray(r.value.values).ravel(),
                rtol=1e-9,
            )
