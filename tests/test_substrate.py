"""Direct tests for the substrate: containers, utils, rcparams, ess, profiling."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl
from pyloo_tpu.containers import DataArray, Dataset, InferenceData
from pyloo_tpu.ops.ess import ess_mean, relative_eff
from pyloo_tpu.utils import _logsumexp, make_ufunc, wrap_xarray_ufunc


class TestDataArray:
    def test_stack_ordering_matches_xarray_semantics(self, rng):
        # (chain, draw, obs) -> (obs, __sample__) with sample index
        # ordered chain-major (chain*n_draw + draw)
        values = rng.normal(size=(2, 3, 4))
        da = DataArray(values, ("chain", "draw", "obs"))
        stacked = da.stack(__sample__=("chain", "draw"))
        assert stacked.dims == ("obs", "__sample__")
        expected = values.transpose(2, 0, 1).reshape(4, 6)
        assert_allclose(stacked.values, expected)
        # stacked coordinate carries (chain, draw) tuples
        assert stacked.coords["__sample__"][0] == (0, 0)
        assert stacked.coords["__sample__"][3] == (1, 0)

    def test_isel_int_and_array(self, rng):
        da = DataArray(
            rng.normal(size=(3, 5)), ("a", "b"), {"b": np.arange(10, 15)}
        )
        sub = da.isel(a=1)
        assert sub.dims == ("b",)
        sub2 = da.isel(b=np.array([0, 2]))
        assert sub2.shape == (3, 2)
        assert list(sub2.coords["b"]) == [10, 12]
        with pytest.raises(KeyError):
            da.isel(c=0)

    def test_sel_by_label(self):
        da = DataArray(
            np.arange(6).reshape(2, 3), ("x", "y"),
            {"y": np.array(["a", "b", "c"])},
        )
        assert da.sel(y="b").values.tolist() == [1, 4]
        with pytest.raises(KeyError):
            da.sel(y="z")

    def test_arithmetic_alignment(self, rng):
        a = DataArray(rng.normal(size=(2, 3)), ("x", "y"))
        b = DataArray(rng.normal(size=(3, 2)), ("y", "x"))
        out = a + b  # dims aligned by name, transposed automatically
        assert_allclose(out.values, a.values + b.values.T)
        reduced = a.mean("y")
        out2 = a - reduced  # broadcast reduced array back
        assert_allclose(out2.values, a.values - a.values.mean(1, keepdims=True))

    def test_reductions_and_where(self, rng):
        da = DataArray(rng.normal(size=(4, 5)), ("r", "c"))
        assert da.mean(("r", "c")) == pytest.approx(da.values.mean())
        assert da.sum("r").dims == ("c",)
        masked = da.where(da > 0, 0.0)
        assert (masked.values >= 0).all()

    def test_coord_getitem(self):
        da = DataArray(np.zeros((2, 3)), ("x", "y"), {"y": np.arange(3)})
        coord = da["y"]
        assert coord.dims == ("y",)
        assert list(coord.values) == [0, 1, 2]


class TestDatasetAndInferenceData:
    def test_dataset_access(self, rng):
        ds = Dataset({"a": DataArray(rng.normal(size=(2, 3)), ("chain", "draw"))})
        assert "a" in ds
        assert ds.a.dims == ("chain", "draw")
        assert list(ds.data_vars) == ["a"]
        ds["b"] = DataArray(np.zeros((2, 3)), ("chain", "draw"))
        assert len(ds) == 2
        sub = ds.isel(chain=0)
        assert sub["a"].dims == ("draw",)

    def test_inference_data_groups(self, rng):
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 10))},
            log_likelihood={"obs": rng.normal(size=(2, 10, 3))},
        )
        assert set(idata.groups()) == {"posterior", "log_likelihood"}
        assert hasattr(idata, "posterior")
        assert not hasattr(idata, "prior")
        copied = idata.copy()
        copied.posterior.mu.values[:] = 0
        assert not np.allclose(idata.posterior.mu.values, 0)

    def test_to_inference_data_paths(self, rng):
        idata = pl.to_inference_data({"mu": rng.normal(size=(2, 5))})
        assert "posterior" in idata.groups()
        arr = pl.to_inference_data(rng.normal(size=(2, 5)))
        assert "posterior" in arr.groups()
        with pytest.raises(ValueError, match="Lists and tuples"):
            pl.to_inference_data([1, 2, 3])
        with pytest.raises(ValueError, match="array-like"):
            pl.to_inference_data({"bad": "string"})
        same = pl.to_inference_data(idata)
        assert same is idata


class TestLogsumexp:
    def test_matches_scipy(self, rng):
        from scipy.special import logsumexp as sp_lse

        x = rng.normal(size=(4, 7))
        assert_allclose(_logsumexp(x), sp_lse(x))
        assert_allclose(_logsumexp(x, axis=1), sp_lse(x, axis=1))
        assert_allclose(
            _logsumexp(x, axis=0, keepdims=True), sp_lse(x, axis=0, keepdims=True)
        )
        assert_allclose(_logsumexp(x, b=0.5), sp_lse(x, b=0.5))
        assert_allclose(_logsumexp(x, b_inv=4), sp_lse(x) - np.log(4))

    def test_edge_cases(self):
        assert _logsumexp(np.array([1, 2, 3]), b_inv=0) == np.inf
        assert _logsumexp(np.array([1.0, 2.0]), b=0) == -np.inf
        out = _logsumexp(np.array([1, 2, 3]))  # int input promoted
        assert isinstance(out, np.float64)


class TestUfuncShims:
    def test_make_ufunc_loops_observations(self, rng):
        x = rng.normal(size=(5, 20))
        f = make_ufunc(lambda row: row.sum(), n_dims=1)
        assert_allclose(f(x), x.sum(axis=1))
        f2 = make_ufunc(lambda row: (row.min(), row.max()), n_output=2, n_dims=1)
        lo, hi = f2(x)
        assert_allclose(lo, x.min(axis=1))
        assert_allclose(hi, x.max(axis=1))

    def test_wrap_xarray_ufunc(self, rng):
        da = DataArray(rng.normal(size=(4, 30)), ("obs", "__sample__"))
        out = wrap_xarray_ufunc(
            lambda row: row.mean(),
            da,
            input_core_dims=[["__sample__"]],
        )
        assert out.dims == ("obs",)
        assert_allclose(out.values, da.values.mean(axis=1))


class TestEss:
    def test_iid_ess_near_n(self, rng):
        draws = rng.normal(size=(4, 500))
        e = ess_mean(draws)
        assert 1000 < e < 3000  # 2000 total, iid

    def test_autocorrelated_ess_lower(self, rng):
        n = 2000
        x = np.empty((2, n))
        for c in range(2):
            noise = rng.normal(size=n)
            x[c, 0] = noise[0]
            for t in range(1, n):
                x[c, t] = 0.95 * x[c, t - 1] + noise[t]
        e = ess_mean(x)
        assert e < 0.2 * 2 * n

    def test_relative_eff(self, rng):
        post = {"mu": rng.normal(size=(4, 250)), "theta": rng.normal(size=(4, 250, 3))}
        r = relative_eff(post, 1000)
        assert 0.3 < r < 2.0


class TestRcParams:
    def test_validation_and_immutability(self):
        with pytest.raises(KeyError):
            pl.rcParams["nonexistent.key"] = 1
        with pytest.raises(ValueError):
            pl.rcParams["stats.ic_scale"] = "bogus"
        with pytest.raises(TypeError):
            del pl.rcParams["stats.ic_scale"]
        with pytest.raises(TypeError):
            pl.rcParams.pop("stats.ic_scale")
        copy = pl.rcParams.copy()
        assert isinstance(copy, dict)
        assert "stats.ic_pointwise" in copy


class TestProfiling:
    def test_throughput_meter(self):
        import time

        from pyloo_tpu.profiling import Throughput

        meter = Throughput()
        with meter.measure(100):
            time.sleep(0.01)
        with meter.measure(50):
            time.sleep(0.01)
        assert meter.total_items == 150
        assert meter.items_per_sec > 0
        assert "150 obs" in meter.summary()

    def test_annotate_usable(self):
        from pyloo_tpu.profiling import annotate

        with annotate("test-region"):
            pass


def test_profiler_trace_writes_files(tmp_path):
    import jax.numpy as jnp

    from pyloo_tpu.profiling import trace

    with trace(str(tmp_path)):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # a plugins/profile directory with at least one artifact appears
    produced = list(tmp_path.rglob("*"))
    assert produced, "profiler trace produced no files"


class TestRcParamsBehaviors:
    """Behavior parity with the reference's rcparams battery
    (``pyloo/tests/base_tests/test_rcparams.py``)."""

    def test_boolean_validation(self):
        pl.rcParams["stats.ic_pointwise"] = True
        assert pl.rcParams["stats.ic_pointwise"] is True
        pl.rcParams["stats.ic_pointwise"] = False
        with pytest.raises(ValueError):
            pl.rcParams["stats.ic_pointwise"] = "maybe"

    def test_scale_validation(self):
        for scale in ("log", "negative_log", "deviance"):
            pl.rcParams["stats.ic_scale"] = scale
            assert pl.rcParams["stats.ic_scale"] == scale
        pl.rcParams["stats.ic_scale"] = "log"
        with pytest.raises(ValueError):
            pl.rcParams["stats.ic_scale"] = "loglog"

    def test_backend_validation(self):
        pl.rcParams["plot.backend"] = "matplotlib"
        with pytest.raises(ValueError):
            pl.rcParams["plot.backend"] = "plotly"

    def test_setdefault_prevented(self):
        with pytest.raises(TypeError):
            pl.rcParams.setdefault("stats.ic_scale", "log")

    def test_string_representation(self):
        text = repr(pl.rcParams)
        assert "stats.ic_scale" in text
        assert "plot.backend" in text

    def test_iteration_and_len(self):
        keys = sorted(pl.rcParams)
        assert "stats.ic_pointwise" in keys
        assert len(pl.rcParams) == len(keys)

    def test_consumed_by_entry_points(self, rng):
        ll = rng.normal(-1, 0.3, size=(2, 200, 10))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        pl.rcParams["stats.ic_pointwise"] = True
        try:
            res = pl.loo(idata, reff=1.0)
            assert "loo_i" in res.index  # pointwise default consumed
        finally:
            pl.rcParams["stats.ic_pointwise"] = False
        pl.rcParams["stats.ic_scale"] = "deviance"
        try:
            res_dev = pl.loo(idata, reff=1.0)
            assert res_dev["scale"] == "deviance"
        finally:
            pl.rcParams["stats.ic_scale"] = "log"


class TestComputeImportanceWeightsDispatch:
    """compute_importance_weights dispatch behaviors (reference
    ``test_base.py``): per-method equivalence with the direct entry points,
    invalid method, case insensitivity."""

    @pytest.fixture()
    def lw_da(self, rng):
        ll = rng.normal(-1, 0.4, size=(2, 200, 12))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        return idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))

    def test_psis_equivalence(self, lw_da):
        lw1, k1 = pl.compute_importance_weights(-lw_da, method="psis", reff=1.0)
        lw2, k2 = pl.psislw(-lw_da, reff=1.0)
        np.testing.assert_allclose(lw1.values, lw2.values, rtol=1e-12)
        np.testing.assert_allclose(k1.values, k2.values, rtol=1e-12)

    def test_sis_tis_equivalence(self, lw_da):
        for method, direct in (("sis", pl.sislw), ("tis", pl.tislw)):
            lw1, d1 = pl.compute_importance_weights(-lw_da, method=method)
            lw2, d2 = direct(-lw_da)
            np.testing.assert_allclose(lw1.values, lw2.values, rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(d1), np.asarray(d2), rtol=1e-12
            )

    def test_method_case_insensitive(self, lw_da):
        lw1, _ = pl.compute_importance_weights(-lw_da, method="PSIS", reff=1.0)
        lw2, _ = pl.compute_importance_weights(-lw_da, method="psis", reff=1.0)
        np.testing.assert_allclose(lw1.values, lw2.values, rtol=1e-12)

    def test_invalid_method(self, lw_da):
        with pytest.raises(ValueError, match="Invalid method"):
            pl.compute_importance_weights(-lw_da, method="bogus")


class TestELPDDataBehaviors:
    """ELPDData container behaviors (reference ``test_elpd.py``)."""

    @pytest.fixture()
    def result(self, rng):
        ll = rng.normal(-1, 0.3, size=(2, 150, 10))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 150))},
            log_likelihood={"obs": ll},
        )
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")
            return pl.loo(idata, pointwise=True, reff=1.0)

    def test_properties(self, result):
        assert result.n_samples == 300
        assert result.n_data_points == 10
        assert isinstance(bool(result.warning), bool)

    def test_deep_copy_independent(self, result):
        cp = result.copy()
        cp.pareto_k.values[...] = 9.9
        assert not np.any(result.pareto_k.values == 9.9)
        cp["elpd_loo"] = 0.0
        assert result["elpd_loo"] != 0.0

    def test_survives_pandas_ops(self, result):
        import pandas as pd

        sliced = result[["elpd_loo", "se"]]
        assert isinstance(sliced, pd.Series)
        # ELPDData subclass preserved through pandas indexing
        assert type(result[["elpd_loo", "se", "p_loo"]]).__name__ in (
            "ELPDData", "Series",
        )

    def test_str_does_not_mutate(self, result):
        before = result.copy()
        _ = str(result)
        np.testing.assert_allclose(
            result.loo_i.values, before.loo_i.values, rtol=0
        )


class TestContainersBreadth:
    """DataArray/Dataset/InferenceData semantics beyond the basics — the
    xarray-replacement surface the whole library stands on."""

    @pytest.fixture()
    def da(self, rng):
        vals = rng.normal(size=(2, 5, 3))
        return DataArray(
            vals,
            ("chain", "draw", "school"),
            {"school": np.array(["a", "b", "c"])},
            "theta",
        )

    def test_isel_int_vs_list_dims(self, da):
        one = da.isel(school=1)
        assert one.dims == ("chain", "draw")
        lst = da.isel(school=[1])
        assert lst.dims == ("chain", "draw", "school")
        assert lst.sizes["school"] == 1
        np.testing.assert_allclose(lst.values[..., 0], one.values)

    def test_sel_by_coord_label(self, da):
        b = da.sel(school="b")
        np.testing.assert_allclose(b.values, da.values[:, :, 1])

    def test_stack_orders_chain_major(self, da):
        st = da.stack(__sample__=("chain", "draw"))
        assert st.dims[-1] == "__sample__" or "__sample__" in st.dims
        flat = st.transpose("school", "__sample__").values
        want = da.values.reshape(10, 3).T  # chain-major flattening
        np.testing.assert_allclose(flat, want)

    def test_transpose_and_roundtrip(self, da):
        tr = da.transpose("school", "chain", "draw")
        assert tr.shape == (3, 2, 5)
        back = tr.transpose("chain", "draw", "school")
        np.testing.assert_allclose(back.values, da.values)

    def test_arithmetic_preserves_metadata(self, da):
        out = (da * 2.0 + 1.0) - da
        assert out.dims == da.dims
        np.testing.assert_allclose(out.values, da.values + 1.0)
        assert list(out.coords["school"]) == ["a", "b", "c"]

    def test_reductions_drop_dims(self, da):
        m = da.mean(dim="draw")
        assert m.dims == ("chain", "school")
        np.testing.assert_allclose(m.values, da.values.mean(axis=1))
        total = da.sum()
        assert np.ndim(np.asarray(total)) == 0 or total.ndim == 0

    def test_copy_is_deep(self, da):
        cp = da.copy()
        cp.values[...] = 0.0
        assert not np.allclose(da.values, 0.0)

    def test_dataset_iteration_and_access(self, da):
        ds = Dataset({"theta": da, "mu": da.isel(school=0).rename("mu")})
        assert set(ds.data_vars) == {"theta", "mu"}
        assert ds["theta"] is ds.theta
        st = ds.stack(__sample__=("chain", "draw"))
        assert "__sample__" in st.theta.dims

    def test_inference_data_groups(self, da):
        idata = InferenceData(posterior=Dataset({"theta": da}))
        assert hasattr(idata, "posterior")
        assert "posterior" in repr(idata)
        with pytest.raises(AttributeError):
            _ = idata.log_likelihood

    def test_from_dict_coords_and_dims(self, rng):
        ll = rng.normal(size=(2, 10, 4))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 10))},
            log_likelihood={"obs": ll},
            coords={"item": np.array([10, 20, 30, 40])},
            dims={"obs": ["item"]},
        )
        obs = idata.log_likelihood.obs
        assert obs.dims == ("chain", "draw", "item")
        assert list(obs.coords["item"]) == [10, 20, 30, 40]

    def test_numpy_interop(self, da):
        arr = np.asarray(da)
        assert arr.shape == (2, 5, 3)
        assert float(np.sum(arr)) == pytest.approx(float(da.sum()))
