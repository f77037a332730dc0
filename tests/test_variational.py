"""Tests for the Laplace and ADVI variational fits."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl
from pyloo_tpu.models import ADVI, Laplace, compute_log_weights
from pyloo_tpu.models.laplace import _regularize_matrix
from pyloo_tpu.models.wrapper import Model


@pytest.fixture(scope="module")
def linreg():
    rng = np.random.default_rng(42)
    n = 500
    X = rng.normal(size=n)
    y = 0.5 + 1.5 * X + rng.normal(0, 0.8, size=n)

    def logp(p, d):
        mu = p["alpha"] + p["beta"] * d["X"]
        s = jnp.exp(p["log_s"])
        lp = (
            -0.5 * (p["alpha"] / 2) ** 2
            - 0.5 * (p["beta"] / 2) ** 2
            - 0.5 * (p["log_s"] / 2) ** 2
        )
        return lp + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi)
            - p["log_s"]
            - 0.5 * ((d["y"] - mu) / s) ** 2
        )

    def ll(p, d):
        mu = p["alpha"] + p["beta"] * d["X"]
        s = jnp.exp(p["log_s"])
        return (
            -0.5 * jnp.log(2 * jnp.pi)
            - p["log_s"]
            - 0.5 * ((d["y"] - mu) / s) ** 2
        )

    return Model(
        "linreg",
        {"X": X, "y": y},
        {"alpha": (), "beta": (), "log_s": ()},
        logp,
        ll,
        obs_keys=("X", "y"),
    )


class TestLaplace:
    def test_map_recovers_truth(self, linreg):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = Laplace(linreg).fit(draws=400, chains=2, seed=0)
        assert abs(res.mu[0] - 0.5) < 0.15
        assert abs(res.mu[1] - 1.5) < 0.15
        assert res.idata.log_likelihood.obs.values.shape == (2, 400, 500)
        # covariance is positive definite
        assert np.all(np.linalg.eigvalsh(res.H_inv) > 0)

    def test_logp_logq_and_loo(self, linreg):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            lap = Laplace(linreg)
            res = lap.fit(draws=400, chains=2, seed=0)
            log_p, log_q = lap.compute_logp(), lap.compute_logq()
            assert log_p.shape == log_q.shape == (800,)
            r = pl.loo_approximate_posterior(
                res.idata, log_p=log_p, log_q=log_q, reff=1.0,
                pointwise=True, seed=0,
            )
        assert np.isfinite(r["elpd_loo"])
        assert r.pareto_k.values.max() < 0.7  # Gaussian posterior: easy

    def test_requires_fit(self, linreg):
        with pytest.raises(RuntimeError, match="fit"):
            Laplace(linreg).compute_logp()

    def test_regularize_matrix(self):
        good = np.eye(3)
        out, msg = _regularize_matrix(good, 1e-8, 1e2)
        assert msg is None and np.array_equal(out, good)
        bad = np.diag([1.0, -1e-6, 2.0])
        with pytest.warns(UserWarning, match="jitter"):
            out, msg = _regularize_matrix(bad, 1e-8, 1e2)
        assert np.all(np.linalg.eigvalsh(out) > 0)
        hopeless = np.diag([1.0, -1e6, 1.0])
        with pytest.raises(np.linalg.LinAlgError):
            _regularize_matrix(hopeless, 1e-8, 1e-4)


class TestADVI:
    @pytest.mark.parametrize("method", ["meanfield", "fullrank"])
    def test_fit_recovers_mean(self, linreg, method):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            advi = ADVI(linreg, method)
            res = advi.fit(n=2000, draws=300, seed=1)
        assert abs(res.mean[0] - 0.5) < 0.2
        assert abs(res.mean[1] - 1.5) < 0.2
        # ELBO decreased (loss trace trending down)
        assert np.mean(res.elbo_trace[-200:]) < np.mean(res.elbo_trace[:200])
        lw = compute_log_weights(advi)
        assert lw.shape == (300,)
        assert np.isfinite(lw).all()

    def test_advi_into_loo_approximate_posterior(self, linreg):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            advi = ADVI(linreg, "meanfield")
            res = advi.fit(n=2000, draws=400, seed=2)
            r = pl.loo_approximate_posterior(
                res.idata,
                log_p=advi.compute_log_p(),
                log_q=advi.compute_log_q(),
                reff=1.0,
                seed=0,
            )
        assert np.isfinite(r["elpd_loo"])
        assert hasattr(r, "approximate_posterior")

    def test_invalid_method(self, linreg):
        with pytest.raises(ValueError, match="meanfield"):
            ADVI(linreg, "laplace")


class TestChEES:
    def test_chees_fit_end_to_end(self, linreg):
        import pyloo_tpu as pl
        from pyloo_tpu.models.wrapper import fit

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            idata = fit(
                linreg, algorithm="chees", draws=300, tune=500, chains=2,
                seed=3,
            )
            res = pl.loo(idata, reff=1.0)
        alpha = idata.posterior.alpha.values
        beta = idata.posterior.beta.values
        assert abs(alpha.mean() - 0.5) < 0.2
        assert abs(beta.mean() - 1.5) < 0.2
        assert np.isfinite(res["elpd_loo"])

    def test_chees_recovers_scale(self):
        import jax
        from pyloo_tpu.models.chees import sample_chees

        scales = np.array([1.0, 5.0, 25.0])

        def logp(q):
            return -0.5 * jnp.sum((q / scales) ** 2)

        draws, accept = sample_chees(
            logp, np.zeros(3), num_warmup=800, num_samples=800,
            num_chains=4, seed=0,
        )
        sds = draws.reshape(-1, 3).std(axis=0)
        assert np.all(np.abs(sds / scales - 1) < 0.25)
        assert 0.3 < accept <= 1.0

    def test_unknown_algorithm(self, linreg):
        from pyloo_tpu.models.wrapper import fit

        with pytest.raises(ValueError, match="Unknown algorithm"):
            fit(linreg, algorithm="slice")


def _gaussian_target_model(n=60, seed=3):
    """y ~ N(mu, 1), mu ~ N(0, 10): the posterior is exactly Gaussian, so
    the Laplace approximation is exact — log_p - log_q is constant."""
    rng = np.random.default_rng(seed)
    y = rng.normal(1.2, 1.0, size=n)

    def logp(p, d):
        return -0.5 * (p["mu"] / 10) ** 2 + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - p["mu"]) ** 2
        )

    def ll(p, d):
        return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - p["mu"]) ** 2

    return Model(
        "gauss", {"y": y}, {"mu": ()}, logp, ll, obs_keys=("y",)
    )


class TestLaplaceExactGaussian:
    """On an exactly Gaussian posterior the Laplace fit IS the posterior:
    log_p - log_q must be constant and loo_approximate_posterior must agree
    with plain PSIS-LOO (reference test_loo_approximate_posterior.py:182)."""

    @pytest.fixture(scope="class")
    def fit(self):
        model = _gaussian_target_model()
        lap = Laplace(model)
        result = lap.fit(draws=800, chains=2, seed=0)
        return model, lap, result

    def test_log_ratio_constant(self, fit):
        model, lap, result = fit
        log_p = lap.compute_logp()
        log_q = lap.compute_logq()
        ratio = log_p - log_q
        assert np.std(ratio) < 0.02  # constant up to MAP/Hessian tolerance

    def test_approx_posterior_loo_matches_plain(self, fit):
        model, lap, result = fit
        log_p = lap.compute_logp()
        log_q = lap.compute_logq()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_approx = pl.loo_approximate_posterior(
                result.idata, log_p=log_p, log_q=log_q, reff=1.0, seed=0
            )
            r_plain = pl.loo(result.idata, reff=1.0)
        assert (
            abs(r_approx["elpd_loo"] - r_plain["elpd_loo"])
            / abs(r_plain["elpd_loo"])
            < 0.01
        )
        assert hasattr(r_approx, "approximate_posterior")

    def test_map_matches_analytic(self, fit):
        model, lap, result = fit
        y = np.asarray(model.data["y"])
        prec = 1 / 100 + len(y)
        assert abs(float(result.mu[0]) - y.sum() / prec) < 1e-4
        assert abs(float(result.H_inv[0, 0]) - 1 / prec) < 1e-4


class TestAdviFullrankVsMeanfield:
    def test_fullrank_captures_correlation(self):
        # strongly correlated 2-D Gaussian target
        rng = np.random.default_rng(0)
        prec = np.linalg.inv(np.array([[1.0, 0.9], [0.9, 1.0]]))

        def logp(p, d):
            x = jnp.stack([p["a"], p["b"]])
            return -0.5 * x @ d["prec"] @ x

        def ll(p, d):
            return jnp.reshape(logp(p, d), (1,))

        model = Model(
            "corr2", {"prec": prec, "y": np.zeros(1)},
            {"a": (), "b": ()}, logp, ll, obs_keys=("y",),
        )
        fr = ADVI(model, method="fullrank")
        res_fr = fr.fit(n=4000, draws=2000, seed=1)
        a = res_fr.idata.posterior.a.values.ravel()
        b = res_fr.idata.posterior.b.values.ravel()
        corr_fr = np.corrcoef(a, b)[0, 1]
        assert corr_fr > 0.7  # fullrank recovers the correlation

        mf = ADVI(model, method="meanfield")
        res_mf = mf.fit(n=4000, draws=2000, seed=1)
        am = res_mf.idata.posterior.a.values.ravel()
        bm = res_mf.idata.posterior.b.values.ravel()
        corr_mf = np.corrcoef(am, bm)[0, 1]
        assert abs(corr_mf) < 0.2  # meanfield cannot
