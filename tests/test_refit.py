"""Tests for the refit workflows: loo_kfold and reloo (slow-ish: real HMC)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

import pyloo_tpu as pl
from pyloo_tpu.loo_kfold import (
    _kfold_split_grouped,
    _kfold_split_random,
    _kfold_split_stratified,
)
from pyloo_tpu.models.wrapper import Model, fit

FAST = dict(draws=300, tune=400, chains=2)


def location_scale_model(y):
    """y ~ Normal(mu, exp(log_s)) — fixed parameter dimension, refittable."""

    def logp(params, data):
        mu, log_s = params["mu"], params["log_s"]
        s = jnp.exp(log_s)
        lp = -0.5 * (mu / 10.0) ** 2 - 0.5 * (log_s / 2.0) ** 2
        resid = (data["y"] - mu) / s
        return lp + jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - log_s - 0.5 * resid**2)

    def log_lik(params, data):
        mu, log_s = params["mu"], params["log_s"]
        s = jnp.exp(log_s)
        resid = (data["y"] - mu) / s
        return -0.5 * jnp.log(2 * jnp.pi) - log_s - 0.5 * resid**2

    return Model(
        name="location_scale",
        data={"y": np.asarray(y, dtype=float)},
        param_shapes={"mu": (), "log_s": ()},
        logp=logp,
        log_lik=log_lik,
        constrain=lambda p: {"mu": p["mu"], "sigma": jnp.exp(p["log_s"])},
        obs_keys=("y",),
    )


@pytest.fixture(scope="module")
def wrapper():
    rng = np.random.default_rng(0)
    y = rng.normal(1.0, 1.0, size=30)
    y[0] = 7.5  # influential outlier -> high pareto k
    model = location_scale_model(y)
    idata = fit(model, seed=7, **FAST)
    return pl.JAXModelWrapper(model, idata, sample_kwargs=dict(seed=11, **FAST))


class TestFoldSplits:
    def test_random_balanced(self):
        folds = _kfold_split_random(K=4, N=103, seed=0)
        vals, counts = np.unique(folds, return_counts=True)
        assert list(vals) == [1, 2, 3, 4]
        assert counts.max() - counts.min() <= 1
        again = _kfold_split_random(K=4, N=103, seed=0)
        assert np.array_equal(folds, again)

    def test_stratified_preserves_classes(self):
        x = np.array([0] * 40 + [1] * 20)
        folds = _kfold_split_stratified(K=4, x=x, seed=0)
        for k in range(1, 5):
            in_fold = x[folds == k]
            assert (in_fold == 1).sum() == 5  # 20/4 per fold

    def test_stratified_continuous_binning(self):
        x = np.linspace(0, 1, 100)
        folds = _kfold_split_stratified(K=5, x=x, seed=1)
        assert set(np.unique(folds)) == {1, 2, 3, 4, 5}
        # each fold spans the range rather than being contiguous
        for k in range(1, 6):
            assert x[folds == k].max() - x[folds == k].min() > 0.5

    def test_grouped_keeps_groups_whole(self):
        groups = np.repeat(np.arange(10), 7)
        folds = _kfold_split_grouped(K=3, groups=groups, seed=2)
        for g in range(10):
            assert len(np.unique(folds[groups == g])) == 1

    def test_grouped_k_clamped(self):
        groups = np.repeat([0, 1, 2], 5)
        folds = _kfold_split_grouped(K=10, groups=groups, seed=0)
        assert folds.max() <= 3

    def test_stratified_nan_rejected(self):
        with pytest.raises(ValueError, match="NaN"):
            _kfold_split_stratified(K=3, x=np.array([1.0, np.nan, 2.0]))


class TestLooKfold:
    def test_basic_kfold(self, wrapper):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_kfold(wrapper, K=4, random_seed=0, pointwise=True)
        assert res["n_data_points"] == 30
        assert res["K"] == 4
        assert np.isfinite(res["elpd_kfold"])
        assert res.kfold_i.values.shape == (30,)
        assert np.all(res.kfold_i.values != 0)
        # the tight K=N == analytic-LOO parity check lives in
        # TestKfoldExactConjugate; here only structural sanity is asserted
        text = str(res)
        assert "fold cross-validation" in text and "elpd_kfold" in text

    def test_explicit_folds_and_validation(self, wrapper):
        folds = np.tile([1, 2], 15)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_kfold(wrapper, folds=folds)
        assert res["K"] == 2
        with pytest.raises(ValueError, match="must match"):
            pl.loo_kfold(wrapper, folds=np.array([1, 2]))
        with pytest.raises(ValueError, match="at least 2 unique"):
            pl.loo_kfold(wrapper, folds=np.ones(30, dtype=int))
        with pytest.raises(ValueError, match=">= 1"):
            pl.loo_kfold(wrapper, folds=np.tile([0, 1], 15))
        with pytest.raises(ValueError, match="positive"):
            pl.loo_kfold(wrapper, K=0)
        with pytest.raises(TypeError, match="JAXModelWrapper"):
            pl.loo_kfold("not a wrapper")

    def test_save_fits(self, wrapper):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_kfold(wrapper, K=2, random_seed=3, save_fits=True)
        assert "fits" in res.index
        assert len(res["fits"]) == 2
        idata_k, val_idx = res["fits"][0]
        assert hasattr(idata_k, "posterior")

    def test_stratified_and_grouped_run(self, wrapper):
        y = wrapper.get_observed_data()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res_s = pl.loo_kfold(wrapper, K=2, stratify=(y > y.mean()), random_seed=0)
            assert res_s.stratified
            res_g = pl.loo_kfold(
                wrapper, K=2, groups=np.repeat(np.arange(6), 5), random_seed=0
            )
            assert res_g.grouped


class TestReloo:
    def test_reloo_refits_bad_k(self, wrapper):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            orig = pl.loo(wrapper.idata, pointwise=True, reff=1.0)
            # force at least one refit by lowering the threshold
            k_thresh = float(np.sort(orig.pareto_k.values)[-2]) - 1e-6
            res = pl.reloo(wrapper, loo_orig=orig, k_thresh=k_thresh, verbose=False)
        n_refit = int(np.sum(orig.pareto_k.values > k_thresh))
        assert n_refit >= 1
        assert int(np.sum(res.pareto_k.values == 0)) >= n_refit
        assert np.isfinite(res["elpd_loo"])
        # exact refits around the outlier move elpd, but not wildly
        assert abs(res["elpd_loo"] - orig["elpd_loo"]) < 10.0
        # original result untouched
        assert not np.any(orig.pareto_k.values == 0)

    def test_reloo_no_bad_k_returns_original(self, wrapper):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            orig = pl.loo(wrapper.idata, pointwise=True, reff=1.0)
            res = pl.reloo(wrapper, loo_orig=orig, k_thresh=10.0, verbose=False)
        assert res is orig

    def test_reloo_requires_wrapper_methods(self):
        class Bad:
            pass

        with pytest.raises(TypeError, match="must be implemented"):
            pl.reloo(Bad())

    def test_data_restored_after_reloo(self, wrapper):
        before = {k: v.copy() for k, v in wrapper.observed_data.items()}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            orig = pl.loo(wrapper.idata, pointwise=True, reff=1.0)
            k_thresh = float(np.sort(orig.pareto_k.values)[-1]) - 1e-6
            pl.reloo(wrapper, loo_orig=orig, k_thresh=k_thresh, verbose=False)
        after = wrapper.observed_data
        for k in before:
            assert_allclose(before[k], after[k])


class TestKfoldInCompare:
    def test_compare_with_kfold_ic(self, wrapper):
        # second model: same data, worse (fixed overlarge scale prior center)
        rng = np.random.default_rng(0)
        y = wrapper.get_observed_data()
        model2 = location_scale_model(y + rng.normal(0, 0.001, size=len(y)))
        from pyloo_tpu.models.wrapper import fit

        idata2 = fit(model2, seed=9, **FAST)
        wrapper2 = pl.JAXModelWrapper(
            model2, idata2, sample_kwargs=dict(seed=13, **FAST)
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = pl.loo_compare(
                {"m1": wrapper, "m2": wrapper2},
                ic="kfold",
                K=2,
                random_seed=0,
            )
        assert "elpd_kfold" in df.columns
        assert set(df.index) == {"m1", "m2"}
        assert np.isfinite(df["elpd_kfold"]).all()


def _conjugate_normal_model(y, prior_sd=10.0):
    """y_i ~ N(mu, 1), mu ~ N(0, prior_sd^2): fully conjugate, analytic LOO."""

    def logp(params, data):
        mu = params["mu"]
        lp = -0.5 * (mu / prior_sd) ** 2
        return lp + jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - 0.5 * (data["y"] - mu) ** 2)

    def log_lik(params, data):
        return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (data["y"] - params["mu"]) ** 2

    return Model(
        name="conjugate_normal",
        data={"y": np.asarray(y, dtype=float)},
        param_shapes={"mu": ()},
        logp=logp,
        log_lik=log_lik,
        obs_keys=("y",),
    )


def _exact_conjugate_sampler(model, draws=4000, chains=2, seed=0, prior_sd=10.0, **_):
    """Exact i.i.d. posterior draws for the conjugate normal model."""
    from pyloo_tpu.models.wrapper import idata_from_flat_draws

    y = np.asarray(model.data["y"])
    prec = 1.0 / prior_sd**2 + len(y)
    mean = y.sum() / prec
    rng = np.random.default_rng(seed)
    mu = mean + rng.standard_normal((chains, draws)) / np.sqrt(prec)
    return idata_from_flat_draws(model, mu[..., None])


def _analytic_loo_i(y, prior_sd=10.0):
    """Closed-form log p(y_i | y_{-i}): Gaussian posterior predictive."""
    y = np.asarray(y, dtype=float)
    out = np.empty_like(y)
    for i in range(len(y)):
        rest = np.delete(y, i)
        prec = 1.0 / prior_sd**2 + len(rest)
        mean = rest.sum() / prec
        var = 1.0 + 1.0 / prec
        out[i] = -0.5 * np.log(2 * np.pi * var) - 0.5 * (y[i] - mean) ** 2 / var
    return out


class TestKfoldExactConjugate:
    """K=N exact CV against the closed-form LOO predictive density.

    With exact conjugate refits per fold, the only error is the logmeanexp
    Monte Carlo noise (~0.01 per obs at S=8000), so this pins the whole fold
    pipeline (assignment, refit, held-out log-lik, elpd) far tighter than the
    reference's 50%-relative kfold-vs-loo check
    (``pyloo/tests/base_tests/test_loo_kfold.py:38-57``).
    """

    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(5)
        y = rng.normal(0.5, 1.0, size=20)
        model = _conjugate_normal_model(y)
        idata = _exact_conjugate_sampler(model, seed=123)
        wrapper = pl.JAXModelWrapper(
            model, idata,
            sample_kwargs=dict(sampler=_exact_conjugate_sampler, seed=321),
        )
        return y, wrapper

    def test_kfold_K_eq_N_matches_analytic(self, setup):
        y, wrapper = setup
        analytic = _analytic_loo_i(y)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_kfold(
                wrapper, K=len(y), random_seed=1, pointwise=True
            )
        assert res["K"] == len(y)
        assert_allclose(res.kfold_i.values, analytic, atol=0.05)
        assert abs(res["elpd_kfold"] - analytic.sum()) < 0.15

    def test_psis_loo_matches_analytic(self, setup):
        y, wrapper = setup
        analytic = _analytic_loo_i(y)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(wrapper.idata, pointwise=True, reff=1.0)
        assert_allclose(res.loo_i.values, analytic, atol=0.05)
        assert abs(res["elpd_loo"] - analytic.sum()) < 0.15

    def test_kfold_K_eq_N_matches_psis_loo(self, setup):
        """The replacement for the old 3.0-elpd ballpark assert: with shared
        exact draws, K=N CV and PSIS-LOO agree to a fraction of a nat."""
        y, wrapper = setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            kf = pl.loo_kfold(wrapper, K=len(y), random_seed=1)
            lo = pl.loo(wrapper.idata, reff=1.0)
        assert abs(kf["elpd_kfold"] - lo["elpd_loo"]) < 0.2


class TestRelooBreadth:
    """reloo option coverage (reference ``test_reloo.py``, 21 behaviors)
    on exact conjugate refits — fast and deterministic."""

    @pytest.fixture(scope="class")
    def conj(self):
        rng = np.random.default_rng(8)
        y = rng.normal(0.5, 1.0, size=25)
        y[0] = 6.0  # outlier
        model = _conjugate_normal_model(y)
        idata = _exact_conjugate_sampler(model, seed=77)
        wrapper = pl.JAXModelWrapper(
            model, idata,
            sample_kwargs=dict(sampler=_exact_conjugate_sampler, seed=78),
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            orig = pl.loo(idata, pointwise=True, reff=1.0)
        return wrapper, orig

    @pytest.mark.parametrize("scale", ["log", "negative_log", "deviance"])
    def test_scales(self, conj, scale):
        wrapper, orig = conj
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.reloo(
                wrapper, k_thresh=0.3, scale=scale, verbose=False
            )
        assert res["scale"] == scale
        assert np.isfinite(res["elpd_loo"])

    @pytest.mark.parametrize("k_thresh", [0.2, 0.5, 0.9])
    def test_thresholds(self, conj, k_thresh):
        wrapper, orig = conj
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.reloo(
                wrapper, loo_orig=orig, k_thresh=k_thresh, verbose=False
            )
        refit = orig.pareto_k.values > k_thresh
        assert np.all(res.pareto_k.values[refit] == 0)
        kept = ~refit
        assert_allclose(
            res.loo_i.values[kept], orig.loo_i.values[kept], rtol=1e-12
        )

    def test_without_original_loo(self, conj):
        wrapper, orig = conj
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.reloo(wrapper, k_thresh=0.4, verbose=False)
        assert np.isfinite(res["elpd_loo"])

    def test_verbose_logging(self, conj, caplog):
        import logging

        wrapper, orig = conj
        logging.disable(logging.NOTSET)
        try:
            with caplog.at_level(logging.INFO, logger="pyloo_tpu.reloo"):
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    pl.reloo(
                        wrapper, loo_orig=orig, k_thresh=0.0, verbose=True
                    )
            assert any("refit" in m.lower() for m in caplog.messages)
        finally:
            logging.disable(logging.INFO)

    def test_exact_refits_match_analytic(self, conj):
        """With k_thresh=0 every observation refits exactly; the result must
        agree with the closed-form LOO predictive density."""
        wrapper, orig = conj
        y = np.asarray(wrapper.model.data["y"])
        analytic = _analytic_loo_i(y)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.reloo(wrapper, loo_orig=orig, k_thresh=0.0, verbose=False)
        assert_allclose(res.loo_i.values, analytic, atol=0.06)
        assert np.all(res.pareto_k.values == 0)

    def test_subsample_initial_pass(self, conj):
        wrapper, orig = conj
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.reloo(
                wrapper, k_thresh=0.4, verbose=False,
                use_subsample=True, subsample_observations=15,
            )
        assert np.isfinite(res["elpd_loo"])


class TestBatchedKfold:
    """Equal-sized folds run as ONE vmapped device program (all K refits in
    a single dispatch); must agree with the serial per-fold loop within
    MC error and engage/disengage on the documented eligibility rules."""

    def test_batched_engages_and_matches_serial(self, wrapper, caplog):
        import logging

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            folds = np.tile(np.arange(1, 6), 6)  # 5 equal folds of 6 (n=30)
            with caplog.at_level(logging.INFO, logger="pyloo_tpu.loo_kfold"):
                res_b = pl.loo_kfold(
                    wrapper, folds=folds, pointwise=True,
                    draws=400, tune=400, chains=2, seed=3,
                )
            assert any("Batched K-fold" in r.message for r in caplog.records)
            # save_fits forces the serial loop (same folds, same sampler class)
            res_s = pl.loo_kfold(
                wrapper, folds=folds, pointwise=True, save_fits=True,
                draws=400, tune=400, chains=2, seed=3,
            )
        assert np.isfinite(res_b["elpd_kfold"])
        # different RNG streams: agreement within Monte-Carlo error
        assert abs(res_b["elpd_kfold"] - res_s["elpd_kfold"]) < 2.0
        assert (
            np.abs(res_b.kfold_i.values - res_s.kfold_i.values).max() < 1.5
        )

    def test_ragged_folds_fall_back(self, wrapper, caplog):
        import logging

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with caplog.at_level(logging.INFO, logger="pyloo_tpu.loo_kfold"):
                res = pl.loo_kfold(
                    wrapper, K=4, random_seed=0,
                    draws=300, tune=300, chains=2,
                )  # 30 % 4 != 0 -> ragged -> serial
        assert not any("Batched K-fold" in r.message for r in caplog.records)
        assert np.isfinite(res["elpd_kfold"])

    def test_custom_sampler_falls_back(self, caplog):
        import logging

        rng = np.random.default_rng(8)
        y = rng.normal(0.5, 1.0, size=10)
        model = _conjugate_normal_model(y)
        idata = _exact_conjugate_sampler(model, seed=77)
        cwrap = pl.JAXModelWrapper(
            model, idata,
            sample_kwargs=dict(sampler=_exact_conjugate_sampler, seed=78),
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with caplog.at_level(logging.INFO, logger="pyloo_tpu.loo_kfold"):
                res = pl.loo_kfold(cwrap, K=5, random_seed=0)
        assert not any("Batched K-fold" in r.message for r in caplog.records)
        assert np.isfinite(res["elpd_kfold"])


class TestBatchedReloo:
    """Leave-one-out refits batch exactly like equal-sized folds."""

    def test_batched_engages_and_agrees_with_serial(self, wrapper, caplog):
        import logging

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            orig = pl.loo(wrapper.idata, pointwise=True, reff=1.0)
            k_thresh = float(np.sort(orig.pareto_k.values)[-3]) - 1e-6
            with caplog.at_level(logging.INFO, logger="pyloo_tpu.reloo"):
                res_b = pl.reloo(
                    wrapper, loo_orig=orig, k_thresh=k_thresh, verbose=True
                )
            assert any("Batched reloo" in r.message for r in caplog.records)
            # a custom sampler (here: plain fit) disables the batched path,
            # forcing the serial loop on a fresh wrapper
            w2 = pl.JAXModelWrapper(
                wrapper.model, wrapper.idata,
                sample_kwargs=dict(
                    wrapper.sample_kwargs,
                    sampler=lambda m, **o: fit(m, **o),
                ),
            )
            res_s = pl.reloo(
                w2, loo_orig=orig, k_thresh=k_thresh, verbose=False
            )
        n_refit = int(np.sum(orig.pareto_k.values > k_thresh))
        assert n_refit >= 2
        assert int(np.sum(res_b.pareto_k.values == 0)) >= n_refit
        # independent MCMC streams: agreement within Monte-Carlo error
        refit_mask = orig.pareto_k.values > k_thresh
        assert (
            np.abs(
                res_b.loo_i.values[refit_mask] - res_s.loo_i.values[refit_mask]
            ).max()
            < 1.5
        )
