"""Leave-future-out CV (loo_lfo) — analytic conjugate-normal oracle.

Model: y_t ~ N(mu, sigma^2) with known sigma, prior mu ~ N(0, tau^2).
The posterior after the first n observations and the M-step-ahead predictive
are closed-form, so every LFO target has an exact value:

    lambda_n = 1/tau^2 + n/sigma^2,   m_n = (sum y_{1:n} / sigma^2) / lambda_n
    log p(y_{n+1} | y_{1:n}) = log N(y_{n+1}; m_n, sigma^2 + 1/lambda_n)

(pyloo_tpu extension — the reference has no LFO; scheme from Bürkner, Gabry
& Vehtari 2020.)
"""

import numpy as np
import pytest

import pyloo_tpu as pl
from pyloo_tpu.models.wrapper import Model, JAXModelWrapper, idata_from_flat_draws

SIGMA = 1.0
TAU = 10.0


def _posterior(y_hist):
    lam = 1.0 / TAU**2 + len(y_hist) / SIGMA**2
    m = (np.sum(y_hist) / SIGMA**2) / lam
    return m, lam


def _analytic_lfo(y, L, M=1):
    """Exact elpd_i = log p(y_{i:i+M-1} | y_{0:i-1}) via the chain rule."""
    out = []
    for i in range(L, len(y) - M + 1):
        total = 0.0
        for j in range(M):
            m, lam = _posterior(y[: i + j])
            var = SIGMA**2 + 1.0 / lam
            total += -0.5 * np.log(2 * np.pi * var) - (y[i + j] - m) ** 2 / (
                2 * var
            )
        out.append(total)
    return np.asarray(out)


def _draws(y_hist, s, seed):
    m, lam = _posterior(y_hist)
    rng = np.random.default_rng(seed)
    return m + rng.normal(size=s) / np.sqrt(lam)


def _loglik_matrix(y, mu_draws):
    # (n_obs, S) normal log-pdf
    return -0.5 * np.log(2 * np.pi * SIGMA**2) - (
        y[:, None] - mu_draws[None, :]
    ) ** 2 / (2 * SIGMA**2)


def _idata(y, L, s=4000, seed=0):
    mu = _draws(y[:L], s, seed)
    ll = _loglik_matrix(y, mu)
    return pl.from_dict(
        posterior={"mu": mu.reshape(1, s)},
        log_likelihood={"obs": ll.T.reshape(1, s, -1)},
    )


def _series(n, seed=7):
    rng = np.random.default_rng(seed)
    return 0.8 + rng.normal(size=n) * SIGMA


def _normal_model(y):
    def logp(params, data):
        mu = params["mu"][0]
        lp = -0.5 * mu**2 / TAU**2
        return lp + np.asarray(
            -0.5 * ((data["y"] - mu) ** 2) / SIGMA**2
        ).sum()

    def log_lik(params, data):
        mu = params["mu"][0]
        import jax.numpy as jnp

        return -0.5 * jnp.log(2 * jnp.pi * SIGMA**2) - (
            data["y"] - mu
        ) ** 2 / (2 * SIGMA**2)

    return Model(
        name="normal_mean",
        data={"y": np.asarray(y)},
        param_shapes={"mu": (1,)},
        logp=logp,
        log_lik=log_lik,
        obs_keys=("y",),
    )


def _conjugate_sampler(model, s=4000, seed=11, **_):
    """Exact posterior draws for the conjugate model — refits are free."""
    mu = _draws(np.asarray(model.data["y"]), s, seed)
    return idata_from_flat_draws(model, mu.reshape(1, s, 1))


class TestArrayPath:
    def test_matches_analytic_for_low_k(self):
        y = _series(40)
        L = 15
        res = pl.loo_lfo(_idata(y, L), L, pointwise=True)
        want = _analytic_lfo(y, L)
        ks = np.asarray(res["pareto_k"])
        got = np.asarray(res["lfo_i"].values)
        low = ks < 0.5
        assert low[: 5].all()  # near-history targets must be reliable
        np.testing.assert_allclose(got[low], want[low], atol=0.1)

    def test_first_target_is_exact_uniform_average(self):
        y = _series(30)
        L = 10
        s = 2000
        mu = _draws(y[:L], s, seed=3)
        ll = _loglik_matrix(y, mu)
        idata = pl.from_dict(
            posterior={"mu": mu.reshape(1, s)},
            log_likelihood={"obs": ll.T.reshape(1, s, -1)},
        )
        res = pl.loo_lfo(idata, L, pointwise=True)
        row = ll[L]
        want = np.log(np.mean(np.exp(row - row.max()))) + row.max()
        got = float(res["lfo_i"].values[0])
        assert got == pytest.approx(want, abs=1e-8)
        assert res["pareto_k"][0] == 0.0

    def test_multistep_matches_analytic(self):
        y = _series(40)
        L = 20
        res = pl.loo_lfo(_idata(y, L, s=8000), L, M=3, pointwise=True)
        want = _analytic_lfo(y, L, M=3)
        assert res["n_data_points"] == len(want)
        ks = np.asarray(res["pareto_k"])
        got = np.asarray(res["lfo_i"].values)
        np.testing.assert_allclose(got[ks < 0.5], want[ks < 0.5], atol=0.15)

    def test_total_and_se(self):
        y = _series(25)
        res = pl.loo_lfo(_idata(y, 10), 10, pointwise=True)
        pw = np.asarray(res["lfo_i"].values)
        assert res["elpd_lfo"] == pytest.approx(pw.sum())
        assert res["se"] == pytest.approx(np.sqrt(len(pw) * np.var(pw)))
        assert res["lfoic"] == pytest.approx(-2 * res["elpd_lfo"])

    def test_high_k_warns_without_wrapper(self):
        y = _series(40)
        y[25:] += 8.0  # regime shift the initial fit cannot cover
        with pytest.warns(UserWarning, match="LFO targets have Pareto k"):
            res = pl.loo_lfo(_idata(y, 10, s=500), 10, pointwise=True)
        assert res["warning"]
        assert (np.asarray(res["pareto_k"]) > res["good_k"]).any()

    def test_validation(self):
        y = _series(12)
        idata = _idata(y, 5, s=100)
        with pytest.raises(TypeError, match="history length L"):
            pl.loo_lfo(idata)
        with pytest.raises(ValueError, match="M must be"):
            pl.loo_lfo(idata, 5, M=0)
        with pytest.raises(ValueError, match="1 <= L <= n_obs - M"):
            pl.loo_lfo(idata, 12)
        with pytest.raises(TypeError, match="requires `data`"):
            pl.loo_lfo(L=5)

    def test_print_template(self):
        y = _series(20)
        res = pl.loo_lfo(_idata(y, 8), 8, pointwise=True)
        text = str(res)
        assert "elpd_lfo" in text
        assert "1-step-ahead" in text
        assert "history >= 8" in text

    def test_scale_negative_log(self):
        y = _series(20)
        res_log = pl.loo_lfo(_idata(y, 8), 8)
        res_neg = pl.loo_lfo(_idata(y, 8), 8, scale="negative_log")
        assert res_neg["elpd_lfo"] == pytest.approx(-res_log["elpd_lfo"])


class TestCompareLfo:
    def test_loo_compare_accepts_lfo_results(self):
        y = _series(30)
        L = 12
        a = pl.loo_lfo(_idata(y, L, s=500, seed=1), L, pointwise=True)
        b_mu = _draws(y[:L], 500, seed=2) + 2.5  # deliberately biased model
        ll_b = _loglik_matrix(y, b_mu)
        b = pl.loo_lfo(
            pl.from_dict(
                posterior={"mu": b_mu.reshape(1, 500)},
                log_likelihood={"obs": ll_b.T.reshape(1, 500, -1)},
            ),
            L,
            pointwise=True,
        )
        df = pl.loo_compare({"good": a, "biased": b})
        assert list(df.index) == ["good", "biased"]
        assert df.loc["good", "rank"] == 0
        assert np.isnan(df.loc["good", "p_lfo"])
        assert df.loc["biased", "elpd_diff"] < 0
        assert df.loc["biased", "dse"] > 0

    def test_raw_data_with_lfo_ic_raises(self):
        y = _series(20)
        a = pl.loo_lfo(_idata(y, 8, s=200), 8, pointwise=True)
        with pytest.raises(ValueError, match="cannot be computed from raw"):
            pl.loo_compare({"a": a, "raw": _idata(y, 8, s=200)})


class TestWrapperRefits:
    def test_refits_track_analytic_under_regime_shift(self):
        y = _series(36)
        y[18:] += 4.0  # drift: PSIS-only LFO degrades, refits must rescue it
        L = 10
        model = _normal_model(y)
        wrapper = JAXModelWrapper(
            model, sample_kwargs={"sampler": _conjugate_sampler}
        )
        res = pl.loo_lfo(
            L=L, wrapper=wrapper, k_threshold=0.4, pointwise=True
        )
        want = _analytic_lfo(y, L)
        got = np.asarray(res["lfo_i"].values)
        assert res["n_refits"] >= 1
        np.testing.assert_allclose(got, want, atol=0.12)
        # every accepted PSIS step is below threshold; refit steps are exact
        ks = np.asarray(res["pareto_k"])
        assert (ks <= 0.4).all()
        refits = np.asarray(res["refit_indices"])
        assert (np.diff(refits) > 0).all() if refits.size > 1 else True
        # wrapper data restored after the sweep
        np.testing.assert_array_equal(wrapper.model.data["y"], y)

    def test_zero_refits_when_threshold_high(self):
        y = _series(20)
        wrapper = JAXModelWrapper(
            _normal_model(y), sample_kwargs={"sampler": _conjugate_sampler}
        )
        res = pl.loo_lfo(L=12, wrapper=wrapper, k_threshold=10.0)
        assert res["n_refits"] == 0
