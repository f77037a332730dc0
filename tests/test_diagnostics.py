"""PSIS diagnostic helpers (pareto_k_*, psis_ess_values, mcse_loo) and
LOO-PIT — R loo-ecosystem parity additions beyond the reference."""

import numpy as np
import pytest

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def loo_res():
    idata = pl.load_example_data("centered_eight")
    return pl.loo(idata, pointwise=True), idata


def _synth(n=30, s=600, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    mu = rng.normal(scale=scale, size=s)
    y = rng.normal(size=n)
    ll = -0.5 * np.log(2 * np.pi) - (y[:, None] - mu[None, :]) ** 2 / 2
    idata = pl.from_dict(
        posterior={"mu": mu.reshape(1, s)},
        log_likelihood={"obs": ll.T.reshape(1, s, n)},
    )
    return idata, y, mu, ll


class TestKHelpers:
    def test_values_and_ids(self, loo_res):
        res, _ = loo_res
        k = pl.pareto_k_values(res)
        assert k.shape == (8,)
        np.testing.assert_array_equal(k, np.asarray(res["pareto_k"].values))
        ids = pl.pareto_k_ids(res, threshold=-10.0)
        np.testing.assert_array_equal(ids, np.arange(8))
        assert pl.pareto_k_ids(res, threshold=10.0).size == 0
        # default threshold = result's good_k
        np.testing.assert_array_equal(
            pl.pareto_k_ids(res), np.nonzero(k > res["good_k"])[0]
        )

    def test_table(self, loo_res):
        res, _ = loo_res
        tab = pl.pareto_k_table(res)
        assert tab.counts.sum() == 8
        assert tab.proportions.sum() == pytest.approx(1.0)
        text = str(tab)
        assert "good" in text and "very bad" in text and "Count" in text

    def test_requires_pointwise(self, loo_res):
        _, idata = loo_res
        res_np = pl.loo(idata, pointwise=False)
        with pytest.raises(ValueError, match="pointwise"):
            pl.pareto_k_values(res_np)


class TestEssAndMcse:
    def test_ess_bounds_and_uniform_case(self):
        idata, _, _, ll = _synth()
        ess = pl.psis_ess_values(idata)
        s = ll.shape[1]
        assert ess.shape == (ll.shape[0],)
        assert (ess > 0).all() and (ess <= s + 1e-6).all()
        # constant rows -> exactly uniform weights -> ESS == S
        ll_const = np.tile(np.linspace(-2, -1, 5)[:, None], (1, 200))
        d = pl.from_dict(log_likelihood={"obs": ll_const.T.reshape(1, 200, 5)})
        np.testing.assert_allclose(pl.psis_ess_values(d, reff=1.0), 200.0, rtol=1e-9)

    def test_mcse_formula_and_aggregation(self):
        idata, _, _, ll = _synth(n=12, s=400, seed=2)
        mcse_i = pl.mcse_loo(idata, pointwise=True)
        # independent recomputation from the public psislw weights
        lw, k = pl.psislw(-ll.copy(), reff=1.0)
        want = np.empty(12)
        for i in range(12):
            a = lw[i] + ll[i]
            e = a.max() + np.log(np.sum(np.exp(a - a.max())))
            rel_var = np.sum(
                np.exp(2 * lw[i]) * (np.exp(ll[i] - e) - 1.0) ** 2
            )
            want[i] = np.nan if k[i] > 0.7 else np.sqrt(rel_var)
        np.testing.assert_allclose(mcse_i, want, rtol=1e-8, equal_nan=True)
        total = pl.mcse_loo(idata)
        assert total == pytest.approx(np.sqrt(np.nansum(want**2)))

    def test_mcse_nan_for_high_k(self):
        rng = np.random.default_rng(5)
        # heavy-tailed ratios: a few extreme draws dominate -> high k
        ll = -np.abs(rng.standard_t(1.05, size=(6, 300))) * 8
        d = pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, 300, 6)})
        m = pl.mcse_loo(d, pointwise=True, reff=1.0)
        lw, k = pl.psislw(-ll.copy(), reff=1.0)
        assert np.isnan(m[np.asarray(k) > 0.7]).all()


class TestLooPit:
    def test_uniform_weights_equal_ecdf(self):
        # constant log-lik rows -> uniform LOO weights -> PIT == empirical CDF
        n, s = 7, 300
        rng = np.random.default_rng(3)
        y = rng.normal(size=n)
        y_hat = rng.normal(size=(n, s))
        ll = np.tile(np.linspace(-2, -1, n)[:, None], (1, s))
        d = pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, s, n)})
        pit = pl.loo_pit(d, y=y, y_hat=y_hat, reff=1.0)
        want = (y_hat <= y[:, None]).mean(axis=1)
        np.testing.assert_allclose(pit.values, want, rtol=1e-9)

    def test_calibrated_model_is_roughly_uniform(self):
        rng = np.random.default_rng(4)
        n, s = 400, 800
        mu = rng.normal(scale=0.05, size=s)  # tight posterior around truth
        y = rng.normal(size=n)
        ll = -0.5 * np.log(2 * np.pi) - (y[:, None] - mu[None, :]) ** 2 / 2
        y_hat = mu[None, :] + rng.normal(size=(n, s))
        d = pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, s, n)})
        pit = np.asarray(pl.loo_pit(d, y=y, y_hat=y_hat, reff=1.0).values)
        assert abs(pit.mean() - 0.5) < 0.05
        assert (pit > 0.9).mean() == pytest.approx(0.1, abs=0.05)
        assert (pit < 0.1).mean() == pytest.approx(0.1, abs=0.05)

    def test_groups_fallback(self):
        n, s = 5, 100
        rng = np.random.default_rng(6)
        y = rng.normal(size=n)
        y_hat = rng.normal(size=(1, s, n))  # (chain, draw, obs)
        ll = rng.normal(-1, 0.1, size=(n, s))
        d = pl.from_dict(
            log_likelihood={"obs": ll.T.reshape(1, s, n)},
            posterior_predictive={"obs": y_hat},
            observed_data={"obs": y},
        )
        pit = pl.loo_pit(d, reff=1.0)
        want = pl.loo_pit(d, y=y, y_hat=y_hat.reshape(s, n).T, reff=1.0)
        np.testing.assert_allclose(pit.values, want.values, rtol=1e-12)

    def test_shape_validation(self):
        idata, y, _, ll = _synth(n=6, s=50)
        with pytest.raises(ValueError, match="does not match"):
            pl.loo_pit(idata, y=y[:6], y_hat=np.zeros((6, 49)))
        with pytest.raises(ValueError, match="observations"):
            pl.loo_pit(idata, y=y[:5], y_hat=np.zeros((6, 50)))


class TestRelativeEff:
    def test_iid_draws_near_one(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 500, 6))
        r = pl.relative_eff(x)
        assert r.shape == (6,)
        assert np.all((r > 0.7) & (r < 1.4))

    def test_autocorrelated_draws_small(self):
        rng = np.random.default_rng(1)
        rho, C, N = 0.9, 4, 500
        ar = np.empty((C, N))
        ar[:, 0] = rng.normal(size=C)
        for t in range(1, N):
            ar[:, t] = rho * ar[:, t - 1] + np.sqrt(1 - rho**2) * rng.normal(
                size=C
            )
        r = pl.relative_eff(ar)  # 2-d input -> scalar
        assert isinstance(r, float)
        # theoretical r_eff for AR(1): (1-rho)/(1+rho) ~= 0.053
        assert 0.01 < r < 0.15

    def test_idata_matches_internal_reff(self):
        idata = pl.load_example_data("centered_eight")
        from pyloo_tpu._common import compute_reff

        first = next(iter(idata.posterior.data_vars.values()))
        n_samples = first.sizes["chain"] * first.sizes["draw"]
        expected = compute_reff(idata, None, n_samples)
        assert pl.relative_eff(idata) == pytest.approx(expected, rel=1e-12)

    def test_dict_input(self):
        rng = np.random.default_rng(2)
        post = {"mu": rng.normal(size=(2, 400)), "tau": rng.normal(size=(2, 400, 3))}
        r = pl.relative_eff(post)
        assert isinstance(r, float) and 0 < r < 2

    def test_validation(self):
        with pytest.raises(ValueError, match="chain"):
            pl.relative_eff(np.ones(10))
        with pytest.raises(ValueError, match="method"):
            pl.relative_eff(np.ones((2, 50)), method="sd")
