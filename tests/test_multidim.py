"""4-D (chain, draw, d1, d2) observation coverage across the estimator stack.

The reference exercises multidimensional observations through
``create_multidimensional_model`` (``pyloo/tests/helpers.py:26-164``) in its
L3/L5 tests.  The invariant checked here is stronger than shape bookkeeping:
every estimator must produce *identical numbers* on the 4-D layout and on the
flattened 2-D equivalent, differing only in the shape of pointwise outputs.
"""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl

D1, D2 = 5, 7


@pytest.fixture(scope="module")
def pair():
    """(multidim idata, flattened idata) with identical contents."""
    rng = np.random.default_rng(3)
    ll = rng.normal(-1.0, 0.4, size=(4, 300, D1, D2))
    post = {"mu": rng.normal(size=(4, 300))}
    md = pl.from_dict(posterior=post, log_likelihood={"obs": ll})
    flat = pl.from_dict(
        posterior=post,
        log_likelihood={"obs": ll.reshape(4, 300, D1 * D2)},
    )
    return md, flat


def _quiet(fn, *args, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fn(*args, **kw)


class TestMultidimEqualsFlat:
    def test_loo(self, pair):
        md, flat = pair
        r_md = _quiet(pl.loo, md, pointwise=True, reff=1.0)
        r_fl = _quiet(pl.loo, flat, pointwise=True, reff=1.0)
        assert r_md.loo_i.values.shape == (D1, D2)
        assert_allclose(
            r_md.loo_i.values.ravel(), r_fl.loo_i.values, rtol=1e-12
        )
        assert_allclose(r_md["elpd_loo"], r_fl["elpd_loo"], rtol=1e-12)
        assert_allclose(
            r_md.pareto_k.values.ravel(), r_fl.pareto_k.values, rtol=1e-12
        )

    def test_waic(self, pair):
        md, flat = pair
        r_md = _quiet(pl.waic, md, pointwise=True)
        r_fl = _quiet(pl.waic, flat, pointwise=True)
        assert r_md.waic_i.values.shape == (D1, D2)
        assert_allclose(
            r_md.waic_i.values.ravel(), r_fl.waic_i.values, rtol=1e-12
        )
        assert_allclose(r_md["elpd_waic"], r_fl["elpd_waic"], rtol=1e-12)
        assert_allclose(r_md["p_waic"], r_fl["p_waic"], rtol=1e-12)

    @pytest.mark.parametrize("method", ["sis", "tis"])
    def test_loo_other_methods(self, pair, method):
        md, flat = pair
        r_md = _quiet(pl.loo, md, pointwise=True, reff=1.0, method=method)
        r_fl = _quiet(pl.loo, flat, pointwise=True, reff=1.0, method=method)
        assert_allclose(
            r_md.loo_i.values.ravel(), r_fl.loo_i.values, rtol=1e-12
        )

    def test_loo_i_flat_index(self, pair):
        md, flat = pair
        full = _quiet(pl.loo, flat, pointwise=True, reff=1.0)
        for idx in (0, 17, D1 * D2 - 1):
            ri = _quiet(pl.loo_i, idx, md, reff=1.0)
            assert_allclose(
                float(ri["elpd_loo"]), full.loo_i.values[idx], rtol=1e-10
            )

    def test_loo_subsample_explicit_indices(self, pair):
        md, flat = pair
        obs = np.array([0, 3, 11, 17, 26, 34])
        r_md = _quiet(
            pl.loo_subsample, md, observations=obs, reff=1.0,
            loo_approximation="lpd", pointwise=True,
        )
        r_fl = _quiet(
            pl.loo_subsample, flat, observations=obs, reff=1.0,
            loo_approximation="lpd", pointwise=True,
        )
        assert_allclose(r_md["elpd_loo"], r_fl["elpd_loo"], rtol=1e-10)
        assert_allclose(
            r_md["subsampling_SE"], r_fl["subsampling_SE"], rtol=1e-10
        )

    def test_psislw(self, pair):
        md, flat = pair
        ll_md = md.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        ll_fl = flat.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        lw_md, k_md = pl.psislw(-ll_md, reff=1.0)
        lw_fl, k_fl = pl.psislw(-ll_fl, reff=1.0)
        assert k_md.values.shape == (D1, D2)
        assert_allclose(k_md.values.ravel(), k_fl.values, rtol=1e-12)
        assert_allclose(
            lw_md.values.reshape(D1 * D2, -1),
            lw_fl.values.reshape(D1 * D2, -1),
            rtol=1e-12,
        )

    def test_compare_multidim_models(self, pair):
        md, flat = pair
        rng = np.random.default_rng(9)
        ll2 = (
            md.log_likelihood.obs.values
            + rng.normal(0, 0.05, size=(4, 300, D1, D2))
        )
        md2 = pl.from_dict(
            posterior={"mu": rng.normal(size=(4, 300))},
            log_likelihood={"obs": ll2},
        )
        cmp = _quiet(pl.loo_compare, {"a": md, "b": md2})
        assert set(cmp.index) == {"a", "b"}
        assert np.isfinite(cmp["elpd_loo"].values).all()

    def test_e_loo_multidim(self, pair):
        md, _ = pair
        ll = md.log_likelihood.obs.stack(__sample__=("chain", "draw"))
        lw, k = pl.psislw(-ll, reff=1.0)
        rng = np.random.default_rng(4)
        values = pl.DataArray(
            rng.normal(size=ll.values.shape),
            ll.dims,
            dict(ll.coords.items()),
            "x",
        )
        res = _quiet(pl.e_loo, values, log_weights=lw, type="mean")
        assert res.value.values.shape == (D1, D2)
        assert np.isfinite(res.value.values).all()
