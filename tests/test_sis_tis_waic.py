"""sis/tis/waic/loo_group behavior batteries (reference ``test_sis.py``,
``test_tis.py``, ``test_waic.py``, ``test_loo_group.py``)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl

from .oracle import sis_row, tis_row


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def centered():
    return pl.load_example_data("centered_eight")


def _quiet(fn, *a, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fn(*a, **kw)


class TestSisTisKernels:
    @pytest.mark.parametrize("fn_pair", [("sislw", sis_row), ("tislw", tis_row)])
    def test_numpy_and_1d_inputs(self, rng, fn_pair):
        name, oracle = fn_pair
        fn = getattr(pl, name)
        lw = rng.normal(size=(6, 500))
        out, diag = fn(lw.copy())
        for i in range(6):
            want_lw, want_d = oracle(lw[i])
            assert_allclose(np.asarray(out)[i], want_lw, rtol=1e-9)
            assert_allclose(np.asarray(diag)[i], want_d, rtol=1e-9)
        # 1-D input: one observation
        out1, d1 = fn(lw[0].copy())
        assert_allclose(np.asarray(out1).ravel(), oracle(lw[0])[0], rtol=1e-9)

    @pytest.mark.parametrize("name", ["sislw", "tislw"])
    def test_weights_normalize(self, rng, name):
        fn = getattr(pl, name)
        lw = rng.normal(size=(4, 300)) * 2
        out, _ = fn(lw)
        sums = np.exp(np.asarray(out)).sum(axis=1)
        assert_allclose(sums, 1.0, rtol=1e-8)

    @pytest.mark.parametrize("name", ["sislw", "tislw"])
    def test_extreme_values(self, rng, name):
        fn = getattr(pl, name)
        lw = rng.normal(size=(3, 200)) * 150  # e^300-scale raw weights
        out, diag = fn(lw)
        assert np.all(np.isfinite(np.asarray(out)))
        assert_allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0, rtol=1e-8)

    @pytest.mark.parametrize("name", ["sislw", "tislw"])
    def test_constant_weights(self, name):
        fn = getattr(pl, name)
        lw = np.zeros((2, 100))
        out, diag = fn(lw)
        assert_allclose(np.asarray(out), -np.log(100), rtol=1e-12)
        # ESS of uniform weights is the sample count
        assert_allclose(np.asarray(diag), 100.0, rtol=1e-9)

    def test_tis_truncation_bound(self, rng):
        lw = rng.normal(size=(1, 1000))
        lw[0, 0] = 40.0  # dominant raw weight
        out, _ = pl.tislw(lw.copy())
        w = np.asarray(out)[0]
        # truncation: no normalized weight exceeds (mean + sqrt(S)) bound
        raw = lw[0] - np.logaddexp.reduce(lw[0])
        assert w.max() < raw.max()  # the spike was truncated

    def test_xarray_like_input(self, centered):
        ll = centered.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        out, ess = pl.sislw(-ll)
        assert out.values.shape == ll.values.shape
        assert np.all(np.asarray(ess) > 1)


class TestWaicBreadth:
    @pytest.mark.parametrize(
        "scale,sign", [("log", 1.0), ("negative_log", -1.0), ("deviance", -2.0)]
    )
    def test_scales(self, centered, scale, sign):
        base = _quiet(pl.waic, centered, scale="log")
        r = _quiet(pl.waic, centered, scale=scale)
        assert_allclose(r["elpd_waic"], sign * base["elpd_waic"], rtol=1e-12)
        assert r["scale"] == scale

    def test_invalid_scale(self, centered):
        with pytest.raises(TypeError):
            pl.waic(centered, scale="bogus")

    def test_nan_inf_handling(self, centered, rng):
        ll = centered.log_likelihood.obs.values.copy()
        ll[0, 0, 0] = np.nan
        ll[0, 1, 1] = np.inf
        ll[1, 0, 2] = -np.inf
        idata = pl.from_dict(
            posterior={
                k: v.values for k, v in centered.posterior.data_vars.items()
            },
            log_likelihood={"obs": ll},
        )
        r = _quiet(pl.waic, idata, pointwise=True)
        assert np.all(np.isfinite(r.waic_i.values))

    def test_constant_loglik(self, rng):
        ll = np.full((2, 200, 10), -1.7)
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        r = _quiet(pl.waic, idata, pointwise=True)
        # zero posterior variance: p_waic = 0, elpd = lppd exactly
        assert_allclose(r["p_waic"], 0.0, atol=1e-12)
        assert_allclose(r["elpd_waic"], 10 * -1.7, rtol=1e-12)

    def test_missing_loglik(self, rng):
        bare = pl.from_dict(posterior={"mu": rng.normal(size=(2, 50))})
        with pytest.raises((TypeError, KeyError, AttributeError, ValueError)):
            pl.waic(bare)

    def test_pointwise_sum_matches_total(self, centered):
        r = _quiet(pl.waic, centered, pointwise=True)
        assert_allclose(
            r.waic_i.values.sum(), r["elpd_waic"], rtol=1e-10
        )


class TestLooGroupBreadth:
    @pytest.fixture(scope="class")
    def grouped(self):
        rng = np.random.default_rng(5)
        n_obs, C, T = 24, 2, 300
        ll = rng.normal(-1.0, 0.3, size=(C, T, n_obs))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(C, T))},
            log_likelihood={"obs": ll},
        )
        groups = np.repeat(np.arange(6), 4)
        return idata, groups

    @pytest.mark.parametrize("method", ["psis", "sis", "tis"])
    def test_methods(self, grouped, method):
        idata, groups = grouped
        r = _quiet(pl.loo_group, idata, groups, method=method, reff=1.0)
        assert r["n_groups"] == 6
        assert np.isfinite(r["elpd_logo"])

    @pytest.mark.parametrize(
        "scale,sign", [("negative_log", -1.0), ("deviance", -2.0)]
    )
    def test_scales(self, grouped, scale, sign):
        idata, groups = grouped
        base = _quiet(pl.loo_group, idata, groups, reff=1.0, scale="log")
        r = _quiet(pl.loo_group, idata, groups, reff=1.0, scale=scale)
        assert_allclose(r["elpd_logo"], sign * base["elpd_logo"], rtol=1e-12)

    def test_reff(self, grouped):
        idata, groups = grouped
        r1 = _quiet(pl.loo_group, idata, groups, reff=1.0, pointwise=True)
        r2 = _quiet(pl.loo_group, idata, groups, reff=0.3, pointwise=True)
        assert np.isfinite(r1["elpd_logo"]) and np.isfinite(r2["elpd_logo"])

    def test_nan_values(self, grouped):
        idata, groups = grouped
        ll = idata.log_likelihood.obs.values.copy()
        ll[0, 0, 0] = np.nan
        bad = pl.from_dict(
            posterior={"mu": idata.posterior.mu.values},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="NaN"):
            r = pl.loo_group(bad, groups, reff=1.0)
        assert np.isfinite(r["elpd_logo"])

    def test_input_validation(self, grouped):
        # reference validation triple (test_loo_group.py:197-219)
        idata, groups = grouped
        with pytest.raises(ValueError, match="match"):
            _quiet(pl.loo_group, idata, groups[:-1], reff=1.0)
        with pytest.raises(TypeError, match="[Ss]cale"):
            _quiet(pl.loo_group, idata, groups, scale="invalid_scale")
        with pytest.raises(ValueError, match="Invalid method"):
            _quiet(pl.loo_group, idata, groups, method="invalid_method")

    def test_singleton_groups_match_loo(self, grouped):
        idata, _ = grouped
        every = np.arange(24)
        r_g = _quiet(pl.loo_group, idata, every, reff=1.0, pointwise=True)
        r_l = _quiet(pl.loo, idata, reff=1.0, pointwise=True)
        assert_allclose(
            np.sort(r_g.logo_i.values), np.sort(r_l.loo_i.values), rtol=1e-9
        )
