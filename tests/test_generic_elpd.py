"""Generic held-out-data elpd (R loo::elpd parity — pyloo_tpu extension)."""

import numpy as np
import pytest

import pyloo_tpu as pl


def _idata(ll):
    # ll: (n_obs, S) -> InferenceData with 1 chain
    n, s = ll.shape
    return pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, s, n)})


def test_matches_manual_logmeanexp():
    rng = np.random.default_rng(0)
    ll = rng.normal(-1.3, 0.6, size=(50, 400))
    res = pl.elpd(_idata(ll), pointwise=True)
    want_i = np.log(np.mean(np.exp(ll - ll.max(1, keepdims=True)), axis=1)) + ll.max(1)
    np.testing.assert_allclose(res["elpd_i"].values, want_i, rtol=1e-10)
    assert res["elpd"] == pytest.approx(want_i.sum())
    assert res["se"] == pytest.approx(np.sqrt(50 * np.var(want_i)))
    assert res["ic"] == pytest.approx(-2 * res["elpd"])
    assert res["n_samples"] == 400 and res["n_data_points"] == 50


def test_scales_and_template():
    rng = np.random.default_rng(1)
    ll = rng.normal(size=(10, 100))
    res = pl.elpd(_idata(ll))
    dev = pl.elpd(_idata(ll), scale="deviance")
    assert dev["elpd"] == pytest.approx(-2 * res["elpd"])
    text = str(res)
    assert "generic elpd function" in text and "ic " in text


def test_nan_cleaning_warns():
    rng = np.random.default_rng(2)
    ll = rng.normal(size=(10, 100))
    ll[3, 5] = np.nan
    with pytest.warns(UserWarning):
        res = pl.elpd(_idata(ll))
    assert np.isfinite(res["elpd"])
