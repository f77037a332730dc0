"""Smoke tier: one fast path per estimator family, ``-m smoke``, <= 60 s.

The full suite is compile-bound on XLA:CPU (790+ tests, minutes); this file
is the inner-loop development tier — every public estimator family exercised
once end-to-end at tiny shapes, with a sanity assertion (finite, right shape,
or a loosely pinned known value).  Deep correctness lives in the per-family
test files; this tier answers "did I just break an entire family?" in under
a minute.

Run:  python -m pytest -m smoke -q
"""

import warnings

import numpy as np
import pytest

import jax.numpy as jnp

import pyloo_tpu as pl

pytestmark = pytest.mark.smoke

C, T, N_OBS = 2, 200, 24  # one canonical tiny shape -> shared jit cache


@pytest.fixture(scope="module")
def idata():
    """Synthetic Gaussian model with every group the L5 metrics need."""
    rng = np.random.default_rng(5)
    theta = rng.normal(0, 1, size=N_OBS)
    y = theta + rng.normal(0, 0.5, size=N_OBS)
    pp = theta[None, None, :] + rng.normal(0, 0.5, size=(C, T, N_OBS))
    mu_draws = rng.normal(0, 0.1, size=(C, T))
    ll = (
        -0.5 * np.log(2 * np.pi * 0.25)
        - (y[None, None, :] - theta[None, None, :] - mu_draws[..., None]) ** 2
        / 0.5
    )
    return pl.from_dict(
        posterior={"mu": mu_draws},
        log_likelihood={"obs": ll},
        posterior_predictive={"obs": pp},
        sample_stats={},
        observed_data={"obs": y},
        dims={"obs": ["obs_id"]},
    ), y


@pytest.fixture(scope="module")
def eight():
    return pl.load_example_data("centered_eight")


def test_psislw_sis_tis(idata):
    d, _ = idata
    ll = np.asarray(d.log_likelihood["obs"].values).reshape(C * T, N_OBS).T
    lw, k = pl.psislw(-ll)
    assert np.asarray(lw).shape == ll.shape
    assert np.isfinite(np.asarray(k)).all()
    for method in ("sis", "tis"):
        lw_m, ess = pl.compute_importance_weights(-ll, method=method)
        assert np.allclose(np.exp(np.asarray(lw_m)).sum(axis=1), 1.0, atol=1e-5)


def test_loo_and_waic(eight):
    r = pl.loo(eight, pointwise=True)
    assert -35.0 < r["elpd_loo"] < -25.0  # pinned window (test_loo: -30.78)
    w = pl.waic(eight)
    assert -35.0 < w["elpd_waic"] < -25.0


def test_loo_i(eight):
    r = pl.loo_i(3, eight)
    assert np.isfinite(r["elpd_loo"])


def test_generic_elpd(eight):
    r = pl.elpd(eight)
    assert np.isfinite(r["elpd"])


def test_e_loo(eight):
    ll = eight.log_likelihood.obs.stack(__sample__=("chain", "draw"))
    lw, _ = pl.psislw(-ll, reff=1.0)
    theta = eight.posterior.theta.stack(__sample__=("chain", "draw"))
    r = pl.e_loo(theta, log_weights=lw, log_ratios=-ll, type="mean")
    assert np.isfinite(np.asarray(r.value)).all()


def test_compare_and_weights(eight):
    non_centered = pl.load_example_data("non_centered_eight")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cmp = pl.loo_compare({"c": eight, "nc": non_centered})
        assert set(np.asarray(cmp.index)) == {"c", "nc"}
        w = pl.loo_model_weights({"c": eight, "nc": non_centered})
    assert np.isclose(float(np.sum(np.asarray(w))), 1.0, atol=1e-6)


def test_loo_subsample(idata):
    d, _ = idata
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = pl.loo_subsample(d, observations=12, seed=1)
        assert np.isfinite(r["elpd_loo"])
        r2 = pl.update_subsample(r, observations=16)
    assert r2["subsample_size"] == 16


def test_loo_group(idata):
    d, _ = idata
    gids = np.arange(N_OBS) % 6
    r = pl.loo_group(d, gids, reff=1.0)
    assert np.isfinite(r["elpd_logo"])


def test_loo_score_crps(idata):
    d, _ = idata
    rng = np.random.default_rng(2)
    pp2 = np.asarray(d.posterior_predictive["obs"].values) + rng.normal(
        0, 0.5, size=(C, T, N_OBS)
    )
    d2 = pl.from_dict(
        posterior={"mu": np.asarray(d.posterior["mu"].values)},
        log_likelihood={"obs": np.asarray(d.log_likelihood["obs"].values)},
        posterior_predictive={
            "obs": np.asarray(d.posterior_predictive["obs"].values),
            "obs2": pp2,
        },
        observed_data={"obs": np.asarray(d.observed_data["obs"].values)},
        dims={"obs": ["obs_id"], "obs2": ["obs_id"]},
    )
    r = pl.loo_score(d2, x_var="obs", x2_var="obs2", seed=0, reff=1.0)
    assert np.isfinite(r.estimates["Estimate"]).all()


def test_loo_predictive_metric(idata):
    d, y = idata
    r = pl.loo_predictive_metric(d, y, var_name="obs", metric="rmse")
    assert np.isfinite(r["estimate"])


def test_loo_approximate_posterior(idata):
    d, _ = idata
    rng = np.random.default_rng(3)
    log_p = rng.normal(-10, 0.5, size=C * T)
    log_q = log_p + rng.normal(0, 0.1, size=C * T)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = pl.loo_approximate_posterior(d, log_p, log_q)
    assert np.isfinite(r["elpd_loo"])


def test_loo_nonfactor():
    rng = np.random.default_rng(42)
    n, c, t = 8, 1, 120
    a = rng.normal(size=(n, n)) * 0.3
    cov = a @ a.T + np.eye(n)
    y = rng.multivariate_normal(rng.normal(size=n), cov)
    mus = rng.normal(0, 0.05, size=(c, t, n))
    covs = np.broadcast_to(cov, (c, t, n, n)).copy()
    d = pl.from_dict(posterior={"mu": mus, "cov": covs}, observed_data={"y": y})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = pl.loo_nonfactor(d)
    assert np.isfinite(r["elpd_loo"])


def test_streaming_family(idata):
    d, _ = idata
    ll = np.asarray(d.log_likelihood["obs"].values).reshape(C * T, N_OBS).T
    llj = jnp.asarray(ll, jnp.float64)

    def gen(idx):
        return llj[idx]

    r = pl.loo_streaming(gen, N_OBS, C * T, chunk_size=16, dtype=jnp.float64)
    full = pl.loo(d, reff=1.0)  # streaming defaults reff=1; pin both
    np.testing.assert_allclose(r["elpd_loo"], full["elpd_loo"], rtol=1e-6)
    w = pl.waic_streaming(gen, N_OBS, C * T, chunk_size=16)
    assert np.isfinite(w["elpd_waic"])


def test_loo_lfo():
    rng = np.random.default_rng(7)
    n, L, s = 40, 25, 800
    y = 0.8 + rng.normal(size=n) * 0.5
    mu = np.mean(y[:L]) + rng.normal(0, 0.5 / np.sqrt(L), size=s)
    ll = -0.5 * np.log(2 * np.pi * 0.25) - (y[None, :] - mu[:, None]) ** 2 / 0.5
    d = pl.from_dict(
        posterior={"mu": mu.reshape(1, s)},
        log_likelihood={"obs": ll.reshape(1, s, n)},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = pl.loo_lfo(d, L)
    assert np.isfinite(r["elpd_lfo"])


@pytest.fixture(scope="module")
def tiny_wrapper():
    """Smallest refittable model: 2 params, 16 obs, 1 chain, 150 draws."""
    from pyloo_tpu.models.wrapper import Model, fit

    rng = np.random.default_rng(0)
    y = rng.normal(1.0, 1.0, size=16)
    y[0] = 6.0  # outlier -> at least one high-k observation

    def logp(params, data):
        mu, log_s = params["mu"], params["log_s"]
        s = jnp.exp(log_s)
        lp = -0.5 * (mu / 10.0) ** 2 - 0.5 * (log_s / 2.0) ** 2
        r = (data["y"] - mu) / s
        return lp + jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - log_s - 0.5 * r**2)

    def log_lik(params, data):
        mu, log_s = params["mu"], params["log_s"]
        s = jnp.exp(log_s)
        r = (data["y"] - mu) / s
        return -0.5 * jnp.log(2 * jnp.pi) - log_s - 0.5 * r**2

    model = Model(
        name="smoke_ls",
        data={"y": y},
        param_shapes={"mu": (), "log_s": ()},
        logp=logp,
        log_lik=log_lik,
        obs_keys=("y",),
    )
    kw = dict(draws=150, tune=150, chains=1)
    idata = fit(model, seed=3, **kw)
    return pl.JAXModelWrapper(model, idata, sample_kwargs=dict(seed=5, **kw))


def test_refit_families(tiny_wrapper):
    """kfold + reloo + moment match share one tiny fitted wrapper."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        kf = pl.loo_kfold(tiny_wrapper, K=2, seed=0)
        assert np.isfinite(kf["elpd_kfold"])
        orig = pl.loo(tiny_wrapper.idata, pointwise=True)
        rl = pl.reloo(tiny_wrapper, orig, k_thresh=0.7, verbose=False)
        assert np.isfinite(rl["elpd_loo"])
        mm = pl.loo_moment_match(tiny_wrapper, orig, split=False, cov=True)
    assert np.isfinite(mm["elpd_loo"])
