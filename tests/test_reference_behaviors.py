"""Behaviors mirrored from the reference test strategy (SURVEY.md §4 tier 1-2)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def centered():
    return pl.load_example_data("centered_eight")


class TestLooEdgePaths:
    def test_one_chain_reff_is_one(self, centered):
        ll = centered.log_likelihood.obs.values[:1]  # single chain
        idata = pl.from_dict(
            posterior={"mu": centered.posterior.mu.values[:1]},
            log_likelihood={"obs": ll},
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(idata)  # reff computed -> 1.0 branch
        assert np.isfinite(res["elpd_loo"])

    def test_missing_posterior_without_reff(self, rng):
        idata = pl.from_dict(log_likelihood={"obs": rng.normal(size=(2, 50, 4))})
        with pytest.raises(TypeError, match="posterior"):
            pl.loo(idata)
        # but works when reff is given explicitly
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(idata, reff=0.8)
        assert np.isfinite(res["elpd_loo"])

    def test_extreme_values(self, centered):
        ll = centered.log_likelihood.obs.values.copy()
        ll[0, :5, 0] = -1e8  # extreme but finite
        idata = pl.from_dict(
            posterior={"mu": centered.posterior.mu.values},
            log_likelihood={"obs": ll},
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(idata, reff=1.0)
        assert np.isfinite(res["elpd_loo"])

    def test_constant_loglik_warns_pointwise_equals_sum(self, rng):
        ll = np.full((2, 100, 6), -1.3)
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 100))},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="point-wise LOO"):
            pl.loo(idata, pointwise=True, reff=1.0)

    def test_multiple_loglik_groups_require_var_name(self, rng):
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 50))},
            log_likelihood={
                "y1": rng.normal(size=(2, 50, 3)),
                "y2": rng.normal(size=(2, 50, 4)),
            },
        )
        with pytest.raises(TypeError, match="var_name"):
            pl.loo(idata, reff=1.0)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(idata, var_name="y2", reff=1.0)
        assert res["n_data_points"] == 4

    def test_sis_tis_low_ess_warns(self, rng):
        # one dominant draw -> tiny ESS
        # one draw with far lower log-lik dominates the -ll weights
        ll = np.full((2, 200, 4), -10.0) + rng.normal(0, 0.01, size=(2, 200, 4))
        ll[0, 0, :] = -80.0
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="Low effective sample size"):
            pl.loo(idata, method="sis", reff=1.0)


class TestELooEdgePaths:
    def test_constant_h_values(self, rng):
        x = np.full((3, 400), 2.5)
        lw = rng.normal(size=(3, 400))
        lw -= np.log(np.exp(lw).sum(axis=1, keepdims=True))
        res = pl.e_loo(
            pl.DataArray(x, ("obs", "__sample__")),
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
            type="mean",
        )
        assert_allclose(res.value.values, 2.5, rtol=1e-12)
        var = pl.e_loo(
            pl.DataArray(x, ("obs", "__sample__")),
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
            type="variance",
        )
        assert_allclose(var.value.values, 0.0, atol=1e-12)

    def test_extreme_weights(self, rng):
        # all mass on one draw: mean == that draw's value
        x = rng.normal(size=(2, 300))
        lw = np.full((2, 300), -1e10)
        lw[:, 7] = 0.0
        res = pl.e_loo(
            pl.DataArray(x, ("obs", "__sample__")),
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
            type="mean",
        )
        assert_allclose(res.value.values, x[:, 7], rtol=1e-9)
        # variance degenerates to 0 (sum w^2 ~= 1)
        var = pl.e_loo(
            pl.DataArray(x, ("obs", "__sample__")),
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
            type="variance",
        )
        assert_allclose(var.value.values, 0.0, atol=1e-9)

    def test_numerical_stability_large_magnitudes(self, rng):
        x = rng.normal(size=(2, 500)) * 1e6
        lw = rng.normal(size=(2, 500))
        lw -= np.log(np.exp(lw).sum(axis=1, keepdims=True))
        res = pl.e_loo(
            pl.DataArray(x, ("obs", "__sample__")),
            log_weights=pl.DataArray(lw, ("obs", "__sample__")),
            type="sd",
        )
        assert np.all(np.isfinite(res.value.values))


class TestSubsampleEdgePaths:
    def test_nan_handling(self, rng):
        mu = rng.normal(-1, 0.2, size=300)
        ll = mu[None, None, :] + rng.normal(0, 0.3, size=(2, 150, 300))
        ll[0, 0, 5] = np.nan
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 150))},
            log_likelihood={"obs": ll},
        )
        np.random.seed(0)
        with pytest.warns(UserWarning, match="NaN values detected"):
            res = pl.loo_subsample(idata, observations=50, reff=1.0)
        assert np.isfinite(res["elpd_loo"])

    def test_multidim_observations(self, rng):
        ll = rng.normal(-1, 0.3, size=(2, 100, 6, 5))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 100))},
            log_likelihood={"obs": ll},
            dims={"obs": ["d1", "d2"]},
        )
        np.random.seed(1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_subsample(
                idata, observations=10, reff=1.0, pointwise=True
            )
        assert res["n_data_points"] == 30
        assert res.loo_i.values.shape == (6, 5)
        assert np.isfinite(res.loo_i.values).sum() == 10
