"""loo_compare option breadth (reference ``test_compare.py``, 25 behaviors)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def models():
    rng = np.random.default_rng(7)
    n, C, T = 40, 2, 300
    base = rng.normal(-1.0, 0.3, size=(C, T, n))
    out = {}
    for i, shift in enumerate((0.0, 0.05, 0.12)):
        out[f"m{i}"] = pl.from_dict(
            posterior={"mu": rng.normal(size=(C, T))},
            log_likelihood={"obs": base - shift},
        )
    return out


def _quiet(fn, *a, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fn(*a, **kw)


class TestCompareBreadth:
    def test_three_models_ranked(self, models):
        df = _quiet(pl.loo_compare, models)
        assert list(df["rank"]) == [0, 1, 2]
        assert df.iloc[0]["elpd_diff"] == 0.0
        assert df["elpd_loo"].is_monotonic_decreasing
        # weights form a simplex
        assert_allclose(df["weight"].sum(), 1.0, rtol=1e-6)

    @pytest.mark.parametrize("ic", ["loo", "waic"])
    @pytest.mark.parametrize("scale", ["log", "negative_log", "deviance"])
    def test_ic_and_scales(self, models, ic, scale):
        df = _quiet(pl.loo_compare, models, ic=ic, scale=scale)
        col = f"elpd_{ic}"
        assert col in df.columns
        if scale == "log":
            assert df[col].is_monotonic_decreasing
        else:
            assert df[col].is_monotonic_increasing  # flipped scales

    @pytest.mark.parametrize(
        "method", ["stacking", "bb-pseudo-bma", "pseudo-bma"]
    )
    def test_waic_methods(self, models, method):
        df = _quiet(pl.loo_compare, models, ic="waic", method=method, seed=0)
        assert_allclose(df["weight"].sum(), 1.0, rtol=1e-6)

    def test_invalid_inputs(self, models):
        with pytest.raises(ValueError, match="ic must be"):
            _quiet(pl.loo_compare, models, ic="dic")
        with pytest.raises((ValueError, TypeError)):
            _quiet(pl.loo_compare, models, method="bma")
        with pytest.raises((ValueError, TypeError)):
            _quiet(pl.loo_compare, models, scale="bogus")
        one = {"only": next(iter(models.values()))}
        with pytest.raises(ValueError):
            _quiet(pl.loo_compare, one)

    def test_mixed_precomputed_ic_error(self, models):
        names = list(models)
        pre = {
            names[0]: _quiet(pl.loo, models[names[0]], pointwise=True),
            names[1]: _quiet(pl.waic, models[names[1]], pointwise=True),
        }
        with pytest.raises(ValueError):
            _quiet(pl.loo_compare, pre)

    def test_precomputed_equals_recomputed(self, models):
        pre = {
            k: _quiet(pl.loo, v, pointwise=True) for k, v in models.items()
        }
        df_pre = _quiet(pl.loo_compare, pre)
        df_new = _quiet(pl.loo_compare, models)
        assert_allclose(
            df_pre["elpd_loo"].values, df_new["elpd_loo"].values, rtol=1e-10
        )
        assert_allclose(
            df_pre["elpd_diff"].values, df_new["elpd_diff"].values,
            rtol=1e-8, atol=1e-10,
        )

    def test_subsample_comparison(self, models):
        df = _quiet(
            pl.loo_compare, models, observations=25, estimator="diff_srs",
        )
        assert np.isfinite(df["elpd_loo"].values).all()

    def test_identical_models_near_equal_weights(self, models):
        m = next(iter(models.values()))
        df = _quiet(
            pl.loo_compare, {"a": m, "b": m}, method="pseudo-bma", seed=0
        )
        assert_allclose(df["weight"].values, [0.5, 0.5], atol=1e-6)
        assert_allclose(df["elpd_diff"].values[1], 0.0, atol=1e-10)
        assert_allclose(df["dse"].values[1], 0.0, atol=1e-10)


class TestLooModelWeights:
    @pytest.mark.parametrize(
        "method", ["stacking", "bb-pseudo-bma", "pseudo-bma"]
    )
    def test_simplex_and_order(self, models, method):
        w = _quiet(pl.loo_model_weights, models, method=method, seed=0)
        assert list(w.index) == list(models.keys())  # insertion order
        assert_allclose(float(w.sum()), 1.0, rtol=1e-6)
        assert np.all(w.values >= 0)

    def test_matches_loo_compare_weights(self, models):
        w = _quiet(pl.loo_model_weights, models)
        df = _quiet(pl.loo_compare, models)
        for name in models:
            assert_allclose(w[name], df.loc[name, "weight"], atol=1e-6)

    def test_precomputed_elpds(self, models):
        pre = {k: _quiet(pl.loo, v, pointwise=True) for k, v in models.items()}
        w = _quiet(pl.loo_model_weights, pre)
        w2 = _quiet(pl.loo_model_weights, models)
        assert_allclose(w.values, w2.values, atol=1e-8)

    def test_validation(self, models):
        with pytest.raises(TypeError):
            pl.loo_model_weights([1, 2])
        one = {"a": next(iter(models.values()))}
        with pytest.raises(ValueError, match="at least two"):
            pl.loo_model_weights(one)
        with pytest.raises(ValueError, match="[Mm]ethod"):
            pl.loo_model_weights(models, method="zzz")
