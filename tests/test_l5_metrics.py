"""Tests for loo_group, loo_i, loo_predictive_metric, loo_score."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl

from .oracle import logmeanexp, psis_matrix


@pytest.fixture(scope="module")
def grouped_idata():
    rng = np.random.default_rng(3)
    n_obs, S = 60, 600
    mu = rng.normal(-1, 0.2, size=n_obs)
    ll = mu[None, None, :] + rng.normal(0, 0.3, size=(2, 300, n_obs))
    return pl.from_dict(
        posterior={"mu": rng.normal(size=(2, 300))},
        log_likelihood={"obs": ll},
    )


class TestLooGroup:
    def test_matches_manual_aggregation(self, grouped_idata):
        group_ids = np.repeat(np.arange(6), 10)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_group(grouped_idata, group_ids, reff=1.0, pointwise=True)
        ll = grouped_idata.log_likelihood.obs.stack(
            __sample__=("chain", "draw")
        ).values
        manual = np.stack(
            [ll[group_ids == g].sum(axis=0) for g in range(6)]
        )
        lw, k = psis_matrix(-manual)
        elpd = np.array(
            [np.log(np.sum(np.exp(lw[g] + manual[g]))) for g in range(6)]
        )
        assert_allclose(res.logo_i.values, elpd, rtol=1e-9)
        assert_allclose(res.pareto_k, k, rtol=1e-9)
        assert res["n_groups"] == 6
        assert_allclose(res["elpd_logo"], elpd.sum(), rtol=1e-9)
        lppd = sum(logmeanexp(row) for row in manual)
        assert_allclose(res["p_logo"], lppd - elpd.sum(), rtol=1e-7)

    def test_print_format(self, grouped_idata):
        group_ids = np.repeat(np.arange(6), 10)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_group(grouped_idata, group_ids, reff=1.0)
        assert "groups log-likelihood matrix" in str(res)
        assert "elpd_logo" in str(res)

    def test_group_length_validation(self, grouped_idata):
        with pytest.raises(ValueError, match="must match"):
            pl.loo_group(grouped_idata, np.arange(5), reff=1.0)

    def test_noninteger_group_labels(self, grouped_idata):
        labels = np.array(["a", "b", "c"] * 20)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_group(grouped_idata, labels, reff=1.0, pointwise=True)
        assert res["n_groups"] == 3
        assert list(res.logo_i.coords["group"]) == ["a", "b", "c"]


class TestLooI:
    def test_matches_full_loo_row(self):
        idata = pl.load_example_data("centered_eight")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            full = pl.loo(idata, pointwise=True, reff=1.0)
            for i in [0, 4, 7]:
                single = pl.loo_i(i, idata, reff=1.0, pointwise=True)
                assert_allclose(
                    single["elpd_loo"], full.loo_i.values[i], rtol=1e-9
                )
                assert_allclose(
                    float(np.atleast_1d(single["pareto_k"])[0]),
                    full.pareto_k.values[i],
                    rtol=1e-9,
                )
        assert single["n_data_points"] == 1
        assert np.isfinite(single["se"])

    def test_index_validation(self):
        idata = pl.load_example_data("centered_eight")
        with pytest.raises(IndexError):
            pl.loo_i(100, idata, reff=1.0)
        with pytest.raises(ValueError, match="single integer"):
            pl.loo_i([0, 1], idata, reff=1.0)
        with pytest.raises(TypeError, match="integer"):
            pl.loo_i("zero", idata, reff=1.0)


@pytest.fixture(scope="module")
def pp_idata():
    # gaussian predictive model with known observations
    rng = np.random.default_rng(11)
    n_obs, C, T = 40, 2, 400
    theta = rng.normal(0, 1, size=n_obs)
    y = theta + rng.normal(0, 0.5, size=n_obs)
    pp = theta[None, None, :] + rng.normal(0, 0.5, size=(C, T, n_obs))
    pp2 = theta[None, None, :] + rng.normal(0, 0.5, size=(C, T, n_obs))
    ll = -0.5 * np.log(2 * np.pi * 0.25) - 0.5 * (
        (y[None, None, :] - pp * 0 - theta[None, None, :]) ** 2
    ) / 0.25
    ll = ll + rng.normal(0, 0.05, size=ll.shape)  # draw-varying
    return pl.from_dict(
        posterior={"theta": rng.normal(size=(C, T))},
        log_likelihood={"obs": ll},
        posterior_predictive={"obs": pp, "obs2": pp2},
        observed_data={"obs": y},
        dims={"obs": ["obs_id"], "obs2": ["obs_id"]},
    ), y


class TestLooPredictiveMetric:
    def test_mae_mse_rmse(self, pp_idata):
        idata, y = pp_idata
        mae = pl.loo_predictive_metric(idata, y, var_name="obs", metric="mae")
        mse = pl.loo_predictive_metric(idata, y, var_name="obs", metric="mse")
        rmse = pl.loo_predictive_metric(idata, y, var_name="obs", metric="rmse")
        assert 0 < mae["estimate"] < 2
        assert_allclose(rmse["estimate"], np.sqrt(mse["estimate"]), rtol=1e-12)
        assert mae["se"] > 0 and mse["se"] > 0

    def test_binary_metrics(self):
        rng = np.random.default_rng(5)
        n_obs = 50
        p = rng.uniform(0.2, 0.8, size=n_obs)
        y = (rng.uniform(size=n_obs) < p).astype(float)
        pp = (rng.uniform(size=(2, 200, n_obs)) < p[None, None, :]).astype(float)
        ll = np.where(
            y[None, None, :] == 1, np.log(p), np.log1p(-p)
        )[None][0] + rng.normal(0, 0.02, size=(2, 200, n_obs))
        idata = pl.from_dict(
            posterior={"p": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
            posterior_predictive={"obs": pp},
            observed_data={"obs": y},
        )
        acc = pl.loo_predictive_metric(idata, y, metric="acc")
        bacc = pl.loo_predictive_metric(idata, y, metric="balanced_acc")
        assert 0 <= acc["estimate"] <= 1
        assert 0 <= bacc["estimate"] <= 1

    def test_validation(self, pp_idata):
        idata, y = pp_idata
        with pytest.raises(ValueError, match="Invalid metric"):
            pl.loo_predictive_metric(idata, y, var_name="obs", metric="mape")
        with pytest.raises(ValueError, match="must match"):
            pl.loo_predictive_metric(idata, y[:-3], var_name="obs")
        with pytest.raises(ValueError, match="does not have a"):
            pl.loo_predictive_metric(idata, y, var_name="obs", group="prior")


class TestLooScore:
    def test_crps_and_scrps(self, pp_idata):
        idata, y = pp_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            crps = pl.loo_score(
                idata, x_var="obs", x2_var="obs2", pointwise=True, seed=0, reff=1.0
            )
            scrps = pl.loo_score(
                idata, x_var="obs", x2_var="obs2", scale=True, seed=0, reff=1.0
            )
        assert crps.estimates["Estimate"] < 0  # CRPS as defined is negative-oriented
        assert crps.estimates["SE"] > 0
        assert crps.pointwise.shape == (40,)
        assert crps.pareto_k is not None
        assert np.isfinite(scrps.estimates["Estimate"])

    def test_seed_reproducible(self, pp_idata):
        idata, y = pp_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = pl.loo_score(idata, x_var="obs", x2_var="obs2", seed=3, reff=1.0)
            b = pl.loo_score(idata, x_var="obs", x2_var="obs2", seed=3, reff=1.0)
        assert_allclose(a.pointwise, b.pointwise)

    def test_permutations_reduce_variance(self, pp_idata):
        idata, y = pp_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            multi = pl.loo_score(
                idata, x_var="obs", x2_var="obs2", permutations=4, seed=1, reff=1.0
            )
        assert np.isfinite(multi.estimates["Estimate"])

    def test_validation(self, pp_idata):
        idata, y = pp_idata
        with pytest.raises(ValueError, match="does not have a"):
            pl.loo_score(idata, x_group="prior", reff=1.0)
        with pytest.raises(ValueError, match="Multiple variables"):
            pl.loo_score(idata, reff=1.0)  # two pp vars, no x_var


class TestLooScoreBreadth:
    """loo_score option/validation coverage mirroring the reference's
    ``test_loo_score.py`` battery."""

    @staticmethod
    def _score(pp_idata, **kw):
        idata, _ = pp_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return pl.loo_score(
                idata, x_var="obs", x2_var="obs2", reff=1.0, seed=0, **kw
            )

    def test_pointwise_shapes(self, pp_idata):
        r = self._score(pp_idata, pointwise=True)
        assert np.atleast_1d(np.asarray(r.pointwise)).shape == (40,)
        assert np.isfinite(r.estimates["Estimate"])
        assert np.isfinite(r.estimates["SE"])
        assert r.pareto_k is not None

    def test_scaled_differs_from_unscaled(self, pp_idata):
        crps = self._score(pp_idata, scale=False)
        scrps = self._score(pp_idata, scale=True)
        assert (
            abs(crps.estimates["Estimate"] - scrps.estimates["Estimate"])
            > 1e-6
        )

    def test_reff_changes_little_but_runs(self, pp_idata):
        idata, _ = pp_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r1 = pl.loo_score(idata, x_var="obs", x2_var="obs2", reff=1.0, seed=0)
            r2 = pl.loo_score(idata, x_var="obs", x2_var="obs2", reff=0.3, seed=0)
        assert np.isfinite(r1.estimates["Estimate"])
        assert np.isfinite(r2.estimates["Estimate"])

    def test_good_k_and_warning_fields(self, pp_idata):
        # diagnostics only with pointwise=True (reference loo_score.py:253)
        r0 = self._score(pp_idata)
        assert r0.good_k is None and r0.pareto_k is None
        r = self._score(pp_idata, pointwise=True)
        assert 0 < r.good_k <= 0.7
        assert isinstance(bool(r.warning), bool)

    def test_missing_groups_raise(self, rng):
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 100))},
            log_likelihood={"obs": rng.normal(size=(2, 100, 6))},
        )
        with pytest.raises((KeyError, ValueError, AttributeError, TypeError)):
            pl.loo_score(idata, reff=1.0)


class TestPredictiveMetricBreadth:
    """Metric functions against hand-computed values and option coverage
    (reference ``test_loo_predictive_metric.py``)."""

    def test_metric_functions_closed_form(self):
        from pyloo_tpu.loo_predictive_metric import (
            _accuracy,
            _balanced_accuracy,
            _mae,
            _mse,
            _rmse,
        )

        y = np.array([1.0, 2.0, 3.0, 4.0])
        yhat = np.array([1.5, 2.0, 2.0, 5.0])
        mae = _mae(y, yhat)
        assert_allclose(mae["estimate"], np.mean([0.5, 0.0, 1.0, 1.0]))
        mse = _mse(y, yhat)
        assert_allclose(mse["estimate"], np.mean([0.25, 0.0, 1.0, 1.0]))
        rmse = _rmse(y, yhat)
        assert_allclose(rmse["estimate"], np.sqrt(mse["estimate"]))
        for m in (mae, mse, rmse):
            assert m["se"] > 0

        yb = np.array([1.0, 0.0, 1.0, 0.0, 1.0])
        pb = np.array([0.9, 0.2, 0.4, 0.6, 0.8])  # thresholded at 0.5
        acc = _accuracy(yb, pb)
        assert_allclose(acc["estimate"], 3 / 5)
        bal = _balanced_accuracy(yb, pb)
        # sensitivity 2/3, specificity 1/2
        assert_allclose(bal["estimate"], (2 / 3 + 1 / 2) / 2)

    @pytest.fixture(scope="class")
    def predictive_setup(self):
        rng = np.random.default_rng(6)
        n, C, T = 25, 2, 200
        theta = rng.normal(0, 1, size=n)
        y = theta + rng.normal(0, 0.5, size=n)
        pp = theta[None, None, :] + rng.normal(0, 0.5, size=(C, T, n))
        ll = (
            -0.5 * np.log(2 * np.pi * 0.25)
            - 0.5 * (y[None, None, :] - pp) ** 2 / 0.25
        )
        idata = pl.from_dict(
            posterior={"theta": rng.normal(size=(C, T))},
            log_likelihood={"obs": ll},
            posterior_predictive={"obs": pp},
        )
        return idata, y

    @pytest.mark.parametrize("metric", ["mae", "mse", "rmse"])
    def test_continuous_metrics_end_to_end(self, predictive_setup, metric):
        idata, y = predictive_setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = pl.loo_predictive_metric(idata, y, metric=metric, r_eff=1.0)
        assert np.isfinite(r["estimate"]) and r["se"] > 0
        if metric == "rmse":
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                r_mse = pl.loo_predictive_metric(
                    idata, y, metric="mse", r_eff=1.0
                )
            assert_allclose(r["estimate"], np.sqrt(r_mse["estimate"]), rtol=1e-10)

    def test_r_eff_changes_weights(self, predictive_setup):
        idata, y = predictive_setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r1 = pl.loo_predictive_metric(idata, y, metric="mae", r_eff=1.0)
            r2 = pl.loo_predictive_metric(idata, y, metric="mae", r_eff=0.2)
        assert np.isfinite(r1["estimate"]) and np.isfinite(r2["estimate"])

    def test_invalid_metric_and_mismatch(self, predictive_setup):
        idata, y = predictive_setup
        with pytest.raises((ValueError, KeyError)):
            pl.loo_predictive_metric(idata, y, metric="mape")
        with pytest.raises((ValueError, IndexError)):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                pl.loo_predictive_metric(idata, y[:-3], metric="mae")

    def test_missing_group(self, predictive_setup):
        idata, y = predictive_setup
        bare = pl.from_dict(
            posterior={"theta": idata.posterior.theta.values},
            log_likelihood={"obs": idata.log_likelihood.obs.values},
        )
        with pytest.raises((KeyError, AttributeError, ValueError, TypeError)):
            pl.loo_predictive_metric(bare, y, metric="mae")


class TestCrpsNonLoo:
    """Posterior-sample (non-LOO) crps/scrps against closed forms."""

    def test_normal_closed_form(self):
        rng = np.random.default_rng(0)
        S = 60_000
        x = rng.normal(size=(S, 4))
        x2 = rng.normal(size=(S, 4))
        y = np.zeros(4)
        res = pl.crps(x, x2, y)
        # X ~ N(0,1), y = 0:  E|X-X'| = 2/sqrt(pi),  E|X| = sqrt(2/pi)
        expect = 1.0 / np.sqrt(np.pi) - np.sqrt(2.0 / np.pi)
        assert_allclose(res.estimates["Estimate"], expect, atol=1.5e-2)
        assert res.pointwise.shape == (4,)
        res_s = pl.scrps(x, x2, y)
        exx, exy = 2 / np.sqrt(np.pi), np.sqrt(2 / np.pi)
        assert_allclose(
            res_s.estimates["Estimate"],
            -exy / exx - 0.5 * np.log(exx),
            atol=1.5e-2,
        )

    def test_chain_draw_layout_and_determinism(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 500, 3))
        x2 = rng.normal(size=(2, 500, 3))
        y = rng.normal(size=3)
        flat = pl.crps(x.reshape(1000, 3), x2.reshape(1000, 3), y)
        cd = pl.crps(x, x2, y)
        assert_allclose(cd.pointwise, flat.pointwise, rtol=1e-12)
        a = pl.crps(x, x2, y, permutations=4, seed=9)
        b = pl.crps(x, x2, y, permutations=4, seed=9)
        assert_allclose(a.pointwise, b.pointwise, rtol=0)

    def test_validation_and_nan_warning(self):
        x = np.ones((100, 2))
        with pytest.raises(ValueError, match="same shape"):
            pl.crps(x, np.ones((100, 3)), np.zeros(2))
        with pytest.raises(ValueError, match="observation shape"):
            pl.crps(x, x, np.zeros(5))
        with pytest.raises(ValueError, match="permutations"):
            pl.crps(x, x, np.zeros(2), permutations=0)
        xn = x.copy()
        xn[0, 0] = np.nan
        with pytest.warns(UserWarning, match="NaN"):
            pl.crps(xn, x, np.zeros(2))
