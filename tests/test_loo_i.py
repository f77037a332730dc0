"""Dedicated loo_i battery (reference ``test_loo_i.py``, 16 behaviors)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def centered():
    return pl.load_example_data("centered_eight")


def _quiet(fn, *a, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fn(*a, **kw)


class TestLooI:
    @pytest.mark.parametrize("scale", ["log", "negative_log", "deviance"])
    def test_basic_scales(self, centered, scale):
        r = _quiet(pl.loo_i, 2, centered, scale=scale, reff=1.0)
        assert np.isfinite(r["elpd_loo"])
        assert r["scale"] == scale
        assert r["n_data_points"] == 1

    def test_matches_loo_every_index(self, centered):
        full = _quiet(pl.loo, centered, pointwise=True, reff=1.0)
        for i in range(8):
            ri = _quiet(pl.loo_i, i, centered, reff=1.0)
            assert_allclose(
                float(ri["elpd_loo"]), full.loo_i.values[i], rtol=1e-10
            )

    def test_one_chain(self, centered):
        one = pl.from_dict(
            posterior={
                k: v.values[:1] for k, v in centered.posterior.data_vars.items()
            },
            log_likelihood={"obs": centered.log_likelihood.obs.values[:1]},
        )
        r = _quiet(pl.loo_i, 0, one)
        assert np.isfinite(r["elpd_loo"])

    def test_pointwise_row(self, centered):
        r = _quiet(pl.loo_i, 1, centered, pointwise=True, reff=1.0)
        assert "loo_i" in r.index
        assert np.asarray(r["loo_i"].values).shape == (1,)

    def test_bad_scale(self, centered):
        with pytest.raises(TypeError, match="scale"):
            pl.loo_i(0, centered, scale="bogus")

    def test_missing_loglik(self, centered):
        bare = pl.from_dict(
            posterior={
                k: v.values for k, v in centered.posterior.data_vars.items()
            }
        )
        with pytest.raises((TypeError, KeyError, AttributeError, ValueError)):
            _quiet(pl.loo_i, 0, bare)

    @pytest.mark.parametrize("method", ["psis", "sis", "tis"])
    def test_methods(self, centered, method):
        # diagnostics appear with pointwise=True, matching reference
        # test_loo_i.py:142-157 (sis/tis carry ess, not pareto_k/good_k)
        r = _quiet(
            pl.loo_i, 3, centered, method=method, reff=1.0, pointwise=True
        )
        assert np.isfinite(r["elpd_loo"])
        if method == "psis":
            assert "pareto_k" in r.index and "good_k" in r.index
        else:
            assert "ess" in r.index
            assert "pareto_k" not in r.index and "good_k" not in r.index

    def test_invalid_method(self, centered):
        with pytest.raises(ValueError, match="Invalid method"):
            _quiet(pl.loo_i, 0, centered, method="bogus")

    def test_invalid_index(self, centered):
        with pytest.raises((IndexError, ValueError)):
            _quiet(pl.loo_i, 99, centered)
        with pytest.raises((IndexError, ValueError)):
            _quiet(pl.loo_i, -9, centered)

    def test_array_index_rejected(self, centered):
        # single-index semantics (parity: reference loo_i is per-observation)
        with pytest.raises((TypeError, ValueError)):
            _quiet(pl.loo_i, np.array([0, 1]), centered)

    def test_nan_handling(self, centered):
        ll = centered.log_likelihood.obs.values.copy()
        ll[0, 0, 2] = np.nan
        idata = pl.from_dict(
            posterior={
                k: v.values for k, v in centered.posterior.data_vars.items()
            },
            log_likelihood={"obs": ll},
        )
        with pytest.warns(UserWarning, match="NaN"):
            r = pl.loo_i(2, idata, reff=1.0)
        assert np.isfinite(r["elpd_loo"])

    def test_sum_over_indices_equals_loo(self, centered):
        full = _quiet(pl.loo, centered, reff=1.0)
        total = sum(
            float(_quiet(pl.loo_i, i, centered, reff=1.0)["elpd_loo"])
            for i in range(8)
        )
        assert_allclose(total, float(full["elpd_loo"]), rtol=1e-9)
