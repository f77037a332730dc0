"""Lazy-stack ingestion: the host transpose-copy is deferred and, on the hot
path, replaced by a device-side obs-major swap.

Reference comparison: the reference library pays xarray's host
``stack``/``transpose`` materialization on every ingest
(``pyloo/utils.py:21-79``); here the canonical ``(chain, draw, obs)``
log-likelihood ships to the device in its original contiguous layout and XLA
performs the swap at HBM bandwidth (``containers.DataArray.stack`` +
``base.as_sample_matrix``).
"""

import numpy as np
import pytest

import pyloo_tpu as pl
import pyloo_tpu.containers as containers_mod
from pyloo_tpu.base import as_sample_matrix
from pyloo_tpu.containers import DataArray


@pytest.fixture
def lazy_always(monkeypatch):
    """Route every stack through the deferred representation and take the
    device swap even on the CPU backend (gated off there by default)."""
    import pyloo_tpu.base as base_mod

    monkeypatch.setattr(containers_mod, "_LAZY_STACK_MIN_ELEMS", 0)
    monkeypatch.setattr(base_mod, "_FORCE_DEVICE_INGEST", True)


@pytest.fixture
def lazy_never(monkeypatch):
    monkeypatch.setattr(containers_mod, "_LAZY_STACK_MIN_ELEMS", 1 << 62)


def _canonical(rng, C=4, D=50, N=7, dtype=np.float64):
    v = rng.normal(size=(C, D, N)).astype(dtype)
    return DataArray(v, ("chain", "draw", "obs"), {"obs": np.arange(N)})


class TestLazyStack:
    def test_deferred_then_materialized_matches_eager(self, lazy_always):
        rng = np.random.default_rng(0)
        da = _canonical(rng)
        st = da.stack(__sample__=("chain", "draw"))
        assert st._lazy is not None
        expected = da.values.transpose(2, 0, 1).reshape(7, 200)
        # metadata available without materializing
        assert st.shape == (7, 200)
        assert st.sizes == {"obs": 7, "__sample__": 200}
        assert st.dtype == np.float64
        assert st.ndim == 2
        assert st.size == 1400
        assert st._lazy is not None  # still deferred after metadata reads
        np.testing.assert_array_equal(st.values, expected)
        assert st._lazy is None  # .values materialized and cached

    def test_contiguous_result_stays_eager(self, lazy_always):
        # obs leading: moving (chain, draw) to the end is the identity
        # permutation, so the reshape is free and nothing defers
        rng = np.random.default_rng(1)
        v = rng.normal(size=(7, 4, 50))
        da = DataArray(v, ("obs", "chain", "draw"))
        st = da.stack(__sample__=("chain", "draw"))
        assert st._lazy is None
        np.testing.assert_array_equal(st.values, v.reshape(7, 200))

    def test_small_arrays_stay_eager_by_default(self):
        rng = np.random.default_rng(2)
        st = _canonical(rng).stack(__sample__=("chain", "draw"))
        assert st._lazy is None

    def test_values_setter_clears_lazy(self, lazy_always):
        rng = np.random.default_rng(3)
        st = _canonical(rng).stack(__sample__=("chain", "draw"))
        assert st._lazy is not None
        st.values = np.zeros((7, 200))
        assert st._lazy is None
        assert st.shape == (7, 200)

    def test_elementwise_view_does_not_materialize(self, lazy_always):
        rng = np.random.default_rng(4)
        da = _canonical(rng)
        st = da.stack(__sample__=("chain", "draw"))
        view = st._elementwise_values()
        assert view is da.values  # the untransposed base
        assert st._lazy is not None

    def test_multidim_obs(self, lazy_always):
        rng = np.random.default_rng(5)
        v = rng.normal(size=(2, 30, 3, 5))
        da = DataArray(v, ("chain", "draw", "g", "t"))
        st = da.stack(__sample__=("chain", "draw"))
        assert st._lazy is not None
        assert st.shape == (3, 5, 60)
        np.testing.assert_array_equal(
            st.values, v.transpose(2, 3, 0, 1).reshape(3, 5, 60)
        )


class TestDeviceObsMajor:
    def test_matrix_parity_with_host_path(self, lazy_always):
        rng = np.random.default_rng(6)
        da = _canonical(rng, C=3, D=40, N=11)
        st = da.stack(__sample__=("chain", "draw"))
        assert st._lazy is not None
        m_dev, S, _ = as_sample_matrix(st)
        assert S == 120
        # force host path on an identical eager stack
        eager = DataArray(st.values, st.dims, dict(st.coords))
        m_host, _, _ = as_sample_matrix(eager)
        np.testing.assert_array_equal(np.asarray(m_dev), np.asarray(m_host))

    def test_device_matrix_is_on_device(self, lazy_always):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        st = _canonical(rng).stack(__sample__=("chain", "draw"))
        m, _, _ = as_sample_matrix(st)
        assert isinstance(m, jnp.ndarray)

    def test_noncontiguous_base_falls_back(self, lazy_always):
        rng = np.random.default_rng(8)
        da = _canonical(rng, D=60)
        thin = da.isel(draw=slice(0, None, 2))  # strided view -> base not C-contiguous
        st = thin.stack(__sample__=("chain", "draw"))
        m, S, _ = as_sample_matrix(st)
        assert S == 120
        expected = thin.values.transpose(2, 0, 1).reshape(7, 120)
        np.testing.assert_array_equal(np.asarray(m), expected)

    def test_rebuild_roundtrip(self, lazy_always):
        rng = np.random.default_rng(9)
        st = _canonical(rng).stack(__sample__=("chain", "draw"))
        m, S, rebuild = as_sample_matrix(st)
        lw_da, diag_da = rebuild(np.asarray(m), np.zeros(m.shape[0]))
        assert lw_da.dims == ("obs", "__sample__")
        assert lw_da.shape == (7, 200)
        np.testing.assert_array_equal(lw_da.values, st.values)


class TestEndToEndParity:
    def test_loo_waic_exact_between_paths(self, lazy_always):
        idata = pl.load_example_data("centered_eight")
        r_lazy = pl.loo(idata, pointwise=True)
        w_lazy = pl.waic(idata, pointwise=True)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(containers_mod, "_LAZY_STACK_MIN_ELEMS", 1 << 62)
            r_eager = pl.loo(idata, pointwise=True)
            w_eager = pl.waic(idata, pointwise=True)
        assert r_lazy["elpd_loo"] == r_eager["elpd_loo"]
        assert w_lazy["elpd_waic"] == w_eager["elpd_waic"]
        np.testing.assert_array_equal(
            np.asarray(r_lazy.pareto_k.values), np.asarray(r_eager.pareto_k.values)
        )
        np.testing.assert_array_equal(
            np.asarray(r_lazy.loo_i.values), np.asarray(r_eager.loo_i.values)
        )

    def test_loo_subsample_exact_between_paths(self, lazy_always):
        rng = np.random.default_rng(10)
        C, D, N = 4, 300, 600
        ll = rng.normal(size=(C, D, N)) - 1.0
        idata = pl.InferenceData(
            posterior={"mu": rng.normal(size=(C, D))},
            log_likelihood={"obs": DataArray(ll, ("chain", "draw", "obs"))},
        )
        r_lazy = pl.loo_subsample(idata, observations=80, seed=42)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(containers_mod, "_LAZY_STACK_MIN_ELEMS", 1 << 62)
            r_eager = pl.loo_subsample(idata, observations=80, seed=42)
        assert r_lazy["elpd_loo"] == r_eager["elpd_loo"]
        assert r_lazy["p_loo"] == r_eager["p_loo"]

    def test_nan_cleaning_still_warns_and_matches(self, lazy_always):
        rng = np.random.default_rng(11)
        ll = rng.normal(size=(4, 50, 7)) - 1.0
        ll[1, 3, 2] = np.nan
        idata = pl.InferenceData(
            posterior={"mu": rng.normal(size=(4, 50))},
            log_likelihood={"obs": DataArray(ll, ("chain", "draw", "obs"))},
        )
        with pytest.warns(UserWarning, match="NaN values detected"):
            r_lazy = pl.loo(idata, pointwise=True)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(containers_mod, "_LAZY_STACK_MIN_ELEMS", 1 << 62)
            with pytest.warns(UserWarning, match="NaN values detected"):
                r_eager = pl.loo(idata, pointwise=True)
        assert r_lazy["elpd_loo"] == r_eager["elpd_loo"]

    def test_clean_data_keeps_lazy_through_cleaning(self, lazy_always):
        from pyloo_tpu._common import clean_log_likelihood

        rng = np.random.default_rng(12)
        st = _canonical(rng).stack(__sample__=("chain", "draw"))
        cleaned = clean_log_likelihood(st, context="LOO")
        assert cleaned is st
        assert cleaned._lazy is not None
