"""End-to-end tests for loo()/waic() against oracle numerics and goldens."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl

from .oracle import logmeanexp, psis_matrix


@pytest.fixture(scope="module")
def centered():
    return pl.load_example_data("centered_eight")


@pytest.fixture(scope="module")
def non_centered():
    return pl.load_example_data("non_centered_eight")


def stacked_ll(idata):
    return (
        idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        .values
    )


class TestLooParity:
    def test_elpd_matches_oracle(self, centered):
        ll = stacked_ll(centered)  # (8, S)
        res = pl.loo(centered, pointwise=True, reff=1.0)
        lw, k = psis_matrix(-ll, reff=1.0)
        elpd_i = np.array(
            [np.log(np.sum(np.exp(lw[i] + ll[i]))) for i in range(ll.shape[0])]
        )
        assert_allclose(res.loo_i.values, elpd_i, rtol=1e-9)
        assert_allclose(res.pareto_k.values, k, rtol=1e-9)
        assert_allclose(res["elpd_loo"], elpd_i.sum(), rtol=1e-9)
        lppd = sum(logmeanexp(ll[i]) for i in range(8))
        assert_allclose(res["p_loo"], lppd - elpd_i.sum(), rtol=1e-8)
        se = np.sqrt(8 * np.var(elpd_i))
        assert_allclose(res["se"], se, rtol=1e-9)
        assert_allclose(res["looic"], -2 * elpd_i.sum(), rtol=1e-9)

    def test_golden_values(self, centered, non_centered):
        # the bundled datasets reproduce the reference README quickstart
        # within print rounding (README.md:75-85): elpd -30.78 (1.35),
        # p_loo 0.95 (0.48), looic 61.56 (2.69), all k < 0.7
        res = pl.loo(centered, pointwise=True)
        assert round(float(res["elpd_loo"]), 2) == -30.78
        assert abs(res["se"] - 1.35) <= 0.011
        assert round(float(res["p_loo"]), 2) == 0.95
        assert round(float(res["p_loo_se"]), 2) == 0.48
        assert round(float(res["looic"]), 2) == 61.56
        assert round(float(res["looic_se"]), 2) == 2.69
        assert float(res.pareto_k.values.max()) < 0.7
        assert not res["warning"]
        res_nc = pl.loo(non_centered)
        assert round(float(res_nc["elpd_loo"]), 2) == -30.72
        assert not res_nc["warning"]

    def test_compare_golden_values(self, centered, non_centered):
        # reference README loo_compare table (README.md:107-114)
        cmp = pl.loo_compare(
            {"centered": centered, "non_centered": non_centered}
        )
        assert list(cmp.index) == ["non_centered", "centered"]
        assert round(float(cmp.loc["non_centered", "elpd_loo"]), 2) == -30.72
        assert round(float(cmp.loc["centered", "elpd_diff"]), 2) == -0.06
        assert round(float(cmp.loc["centered", "dse"]), 2) == 0.06
        assert float(cmp.loc["non_centered", "weight"]) > 0.999
        assert float(cmp.loc["centered", "weight"]) < 1e-12

    def test_scales(self, centered):
        log = pl.loo(centered, scale="log", reff=0.9)
        neg = pl.loo(centered, scale="negative_log", reff=0.9)
        dev = pl.loo(centered, scale="deviance", reff=0.9)
        assert_allclose(neg["elpd_loo"], -log["elpd_loo"], rtol=1e-12)
        assert_allclose(dev["elpd_loo"], -2 * log["elpd_loo"], rtol=1e-12)
        with pytest.raises(TypeError, match="Valid scale values"):
            pl.loo(centered, scale="bogus")

    def test_reff_changes_tail(self, centered):
        r1 = pl.loo(centered, pointwise=True, reff=1.0)
        r2 = pl.loo(centered, pointwise=True, reff=0.05)
        assert not np.allclose(r1.pareto_k.values, r2.pareto_k.values)

    def test_sis_tis(self, centered):
        with pytest.warns(UserWarning, match="SIS"):
            rs = pl.loo(centered, method="sis", pointwise=True)
        with pytest.warns(UserWarning, match="TIS"):
            rt = pl.loo(centered, method="tis", pointwise=True)
        assert "ess" in rs.index and "ess" in rt.index
        # close to psis on this well-behaved dataset
        rp = pl.loo(centered)
        assert abs(rs["elpd_loo"] - rp["elpd_loo"]) < 0.5
        with pytest.raises(ValueError, match="Invalid method"):
            pl.loo(centered, method="bogus")

    def test_result_layout(self, centered):
        res = pl.loo(centered, pointwise=True)
        for key in [
            "elpd_loo", "se", "p_loo", "p_loo_se", "n_samples",
            "n_data_points", "warning", "loo_i", "scale", "looic",
            "looic_se", "pareto_k", "good_k", "subsample_size",
        ]:
            assert key in res.index, key
        assert res["n_samples"] == 2000
        assert res["n_data_points"] == 8
        assert res["good_k"] == min(1 - 1 / np.log10(2000), 0.7)
        res2 = pl.loo(centered)
        assert "loo_i" not in res2.index and "pareto_k" not in res2.index

    def test_nan_handling(self, centered):
        ll = centered.log_likelihood.obs.values.copy()
        ll[0, 0, 0] = np.nan
        idata = pl.from_dict(
            posterior={
                k: v.values for k, v in centered.posterior.data_vars.items()
            },
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="NaN values detected"):
            res = pl.loo(idata, reff=1.0)
        assert np.isfinite(res["elpd_loo"])

    def test_jacobian(self, centered):
        base = pl.loo(centered, pointwise=True, reff=1.0)
        adj = np.full(8, 0.5)
        res = pl.loo(centered, pointwise=True, reff=1.0, jacobian=adj)
        assert_allclose(res.loo_i.values, base.loo_i.values + 0.5, rtol=1e-12)
        assert_allclose(res["elpd_loo"], base["elpd_loo"] + 4.0, rtol=1e-9)
        with pytest.raises(ValueError, match="pointwise"):
            pl.loo(centered, pointwise=False, jacobian=adj)
        with pytest.raises(ValueError, match="shape"):
            pl.loo(centered, pointwise=True, jacobian=np.ones(3))

    def test_mixture(self, centered):
        with pytest.warns(UserWarning, match="Mix-IS-LOO"):
            res = pl.loo(centered, mixture=True, pointwise=True, reff=1.0)
        assert "p_loo" not in res.index
        assert np.isfinite(res["elpd_loo"])
        assert np.all(res.pareto_k.values == 0)

    def test_print_formats(self, centered, non_centered, rng):
        text = str(pl.loo(centered, pointwise=True))
        assert "Computed from 2000 posterior samples and 8 observations" in text
        assert "All Pareto k estimates are good" in text
        text_nc = str(pl.loo(non_centered, pointwise=True))
        assert "All Pareto k estimates are good" in text_nc
        text_np = str(pl.loo(non_centered))
        assert "Estimate" in text_np
        # the k-diagnostic histogram table appears when some k are bad
        z = rng.standard_t(df=1.5, size=(2, 400, 12))
        heavy = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 400))},
            log_likelihood={"obs": -np.abs(z)},
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            text_h = str(pl.loo(heavy, pointwise=True, reff=1.0))
        assert "Pareto k diagnostic values:" in text_h


class TestWaic:
    def test_matches_direct(self, centered):
        ll = stacked_ll(centered)
        res = pl.waic(centered, pointwise=True)
        lppd_i = np.array([logmeanexp(row) for row in ll])
        p_i = ll.var(axis=1)
        waic_i = lppd_i - p_i
        assert_allclose(res.waic_i.values, waic_i, rtol=1e-9)
        assert_allclose(res["elpd_waic"], waic_i.sum(), rtol=1e-9)
        assert_allclose(res["p_waic"], p_i.sum(), rtol=1e-9)

    def test_inf_handling(self, centered):
        ll = centered.log_likelihood.obs.values.copy()
        ll[0, 0, 0] = np.inf
        ll[0, 0, 1] = -np.inf
        idata = pl.from_dict(
            posterior={"mu": centered.posterior.mu.values},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="Infinite values detected"):
            res = pl.waic(idata)
        assert np.isfinite(res["elpd_waic"])

    def test_waic_print(self, centered):
        text = str(pl.waic(centered))
        assert "elpd_waic" in text and "p_waic" in text

    def test_high_variance_warning(self, rng):
        ll = rng.normal(size=(4, 250, 6)) * 2.0  # var over draws >> 0.4
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(4, 250))},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="exceeds 0.4"):
            pl.waic(idata)


class TestMultidimObs:
    def test_loo_2d_observations(self, rng):
        ll = rng.normal(-1.0, 0.4, size=(4, 300, 5, 7))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(4, 300))},
            log_likelihood={"obs": ll},
            dims={"obs": ["d1", "d2"]},
        )
        res = pl.loo(idata, pointwise=True, reff=1.0)
        assert res["n_data_points"] == 35
        assert res.loo_i.values.shape == (5, 7)
        assert res.pareto_k.values.shape == (5, 7)
        flat = ll.transpose(2, 3, 0, 1).reshape(35, -1)
        lw, k = psis_matrix(-flat)
        elpd_i = np.array([np.log(np.sum(np.exp(lw[i] + flat[i]))) for i in range(35)])
        assert_allclose(res.loo_i.values.ravel(), elpd_i, rtol=1e-9)


class TestLooRemainingBehaviors:
    def test_identical_pointwise_warns(self, rng):
        # reference loo.py:378-381: all loo_i equal suggests a summed logp
        ll = np.tile(rng.normal(-1, 0.3, size=(2, 200, 1)), (1, 1, 6))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="point-wise LOO is the same"):
            pl.loo(idata, pointwise=True, reff=1.0)

    def test_var_name_selects_group(self, rng):
        ll_a = rng.normal(-1, 0.3, size=(2, 150, 8))
        ll_b = rng.normal(-2, 0.3, size=(2, 150, 5))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 150))},
            log_likelihood={"y1": ll_a, "y2": ll_b},
        )
        ra = pl.loo(idata, var_name="y1", reff=1.0)
        rb = pl.loo(idata, var_name="y2", reff=1.0)
        assert ra["n_data_points"] == 8
        assert rb["n_data_points"] == 5
        assert ra["elpd_loo"] != rb["elpd_loo"]
        # ambiguous without var_name
        with pytest.raises((TypeError, ValueError)):
            pl.loo(idata, reff=1.0)

    def test_moment_match_requires_wrapper_or_fns(self, centered):
        with pytest.raises((ValueError, TypeError)):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                pl.loo(
                    centered, pointwise=True, reff=1.0, moment_match=True
                )
