"""Scatter-free compact PSIS (`psislw_compact`): identical weights to
`psislw` without materializing the (B, S) smoothed matrix.

Reference comparison: the reference's `psislw` (pyloo/psis.py:25-111) always
returns the dense smoothed matrix; the compact form here is a strict
superset capability (dense is recoverable via `densify`).
"""

import numpy as np
import pytest

import pyloo_tpu as pl
from pyloo_tpu.ops import psislw_batch, psislw_compact_batch, tail_length


def _dense(lw_raw, reff=1.0):
    m = tail_length(lw_raw.shape[1], reff)
    lw, k = psislw_batch(lw_raw, m)
    return np.asarray(lw), np.asarray(k)


class TestCompactParity:
    @pytest.mark.parametrize("seed,B,S", [(0, 17, 500), (1, 64, 1000), (2, 3, 50)])
    def test_densify_matches_dense_kernel(self, seed, B, S):
        rng = np.random.default_rng(seed)
        raw = rng.standard_t(df=3, size=(B, S))  # heavy tails -> real smoothing
        dense, k_dense = _dense(raw)
        compact = pl.psislw_compact(raw)
        np.testing.assert_allclose(compact.densify(raw), dense, rtol=0, atol=1e-12)
        np.testing.assert_allclose(compact.pareto_k, k_dense, rtol=0, atol=1e-12)

    def test_light_tail_no_smoothing(self):
        # k not finite / n_tail small paths: tiny S so n_tail <= 4
        rng = np.random.default_rng(3)
        raw = rng.normal(size=(5, 12))
        dense, k_dense = _dense(raw)
        compact = pl.psislw_compact(raw)
        assert np.all(np.isinf(compact.pareto_k) == np.isinf(k_dense))
        np.testing.assert_allclose(compact.densify(raw), dense, rtol=0, atol=1e-12)

    def test_tied_tail_values(self):
        # ties crossing the cutoff exercise the strict-> membership and the
        # tie-run plotting positions both kernels must share
        rng = np.random.default_rng(4)
        raw = np.round(rng.standard_t(df=2, size=(9, 400)), 1)  # many ties
        dense, _ = _dense(raw)
        compact = pl.psislw_compact(raw)
        np.testing.assert_allclose(compact.densify(raw), dense, rtol=0, atol=1e-12)

    def test_rows_sum_to_one(self):
        rng = np.random.default_rng(5)
        raw = rng.standard_t(df=3, size=(11, 800))
        compact = pl.psislw_compact(raw)
        lw = compact.densify(raw)
        np.testing.assert_allclose(
            np.exp(lw).sum(axis=1), np.ones(11), rtol=0, atol=1e-10
        )

    def test_reff_changes_tail_budget(self):
        rng = np.random.default_rng(6)
        raw = rng.standard_t(df=3, size=(4, 1000))
        c1 = pl.psislw_compact(raw, reff=1.0)
        c2 = pl.psislw_compact(raw, reff=0.25)
        assert c2.tail_idx.shape[1] > c1.tail_idx.shape[1]
        d1, _ = _dense(raw, reff=1.0)
        np.testing.assert_allclose(c1.densify(raw), d1, rtol=0, atol=1e-12)

    def test_too_few_draws_raises(self):
        with pytest.raises(ValueError, match="at least 2 draws"):
            pl.psislw_compact(np.zeros((3, 1)))

    def test_dataarray_chain_draw_ingestion(self):
        # same ingestion contract as psislw: chain/draw dims stack into
        # __sample__, multidim obs dims flatten into the leading axis
        from pyloo_tpu.containers import DataArray

        rng = np.random.default_rng(12)
        vals = rng.standard_t(df=3, size=(4, 250, 3, 5))  # (chain,draw,g,i)
        da = DataArray(vals, ("chain", "draw", "g", "i"))
        lw_dense, k_dense = pl.psislw(da)
        compact = pl.psislw_compact(da)
        raw_flat = np.moveaxis(vals, (2, 3), (0, 1)).reshape(15, 1000)
        dense_flat = np.asarray(lw_dense.values).reshape(15, 1000)
        np.testing.assert_allclose(
            compact.densify(raw_flat), dense_flat, rtol=0, atol=1e-12
        )
        np.testing.assert_allclose(
            compact.pareto_k, np.asarray(k_dense.values).ravel(), atol=1e-12
        )


class TestCompactConsumers:
    def test_weighted_mean_matches_dense(self):
        rng = np.random.default_rng(7)
        raw = rng.standard_t(df=3, size=(13, 600))
        h = rng.normal(size=(13, 600))
        compact = pl.psislw_compact(raw)
        dense, _ = _dense(raw)
        expected = np.sum(h * np.exp(dense), axis=1)
        got = compact.weighted_mean(h, raw)
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)

    def test_no_cancellation_on_extreme_tails(self):
        # raw tail weights orders of magnitude above the smoothed normalizer:
        # an include-then-subtract evaluation loses ~1e-6 relative here; the
        # masked form must stay at float64 accuracy
        rng = np.random.default_rng(7)
        raw = rng.standard_t(df=3, size=(13, 600))
        h = rng.normal(size=(13, 600))
        compact = pl.psislw_compact(raw)
        assert np.exp(np.max(raw - compact.log_norm[:, None])) > 1e6
        expected = np.sum(h * np.exp(compact.densify(raw)), axis=1)
        got = compact.weighted_mean(h, raw)
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)

    def test_weighted_moments_match_dense_e_loo(self):
        from pyloo_tpu.ops.expectations import (
            weighted_mean_batch,
            weighted_variance_batch,
        )

        rng = np.random.default_rng(9)
        raw = rng.standard_t(df=3, size=(13, 600))
        h = rng.normal(size=(13, 600))
        compact = pl.psislw_compact(raw)
        dense, _ = _dense(raw)
        mean, var = compact.weighted_moments(h, raw)
        np.testing.assert_allclose(
            mean, np.asarray(weighted_mean_batch(h, dense)), rtol=1e-10
        )
        np.testing.assert_allclose(
            var, np.asarray(weighted_variance_batch(h, dense)), rtol=1e-9
        )
        sd = compact.weighted_sd(h, raw)
        np.testing.assert_allclose(sd, np.sqrt(var), rtol=0, atol=0)

    def test_weighted_moments_degenerate_rows(self):
        # constant h -> variance exactly 0 (reference _wvar_func semantics)
        rng = np.random.default_rng(10)
        raw = rng.standard_t(df=3, size=(3, 400))
        h = np.ones((3, 400)) * 2.5
        compact = pl.psislw_compact(raw)
        mean, var = compact.weighted_moments(h, raw)
        np.testing.assert_allclose(mean, np.full(3, 2.5), rtol=1e-12)
        np.testing.assert_array_equal(var, np.zeros(3))

    def test_memory_footprint_is_compact(self):
        rng = np.random.default_rng(8)
        S = 4000
        raw = rng.standard_t(df=3, size=(32, S)).astype(np.float64)
        compact = pl.psislw_compact(raw)
        M = compact.tail_idx.shape[1]
        compact_elems = 32 * (2 * M + 2)
        assert compact_elems < 32 * S / 5  # > 5x smaller at S=4000

    def test_kernel_nan_poisoning_consistency(self):
        # constant tail rows (sigma fit degenerate paths) must match dense
        raw = np.concatenate(
            [np.zeros((1, 300)), np.linspace(0, 5, 300)[None, :]], axis=0
        )
        m = tail_length(300, 1.0)
        dense, k_d = psislw_batch(raw, m)
        log_norm, tail_idx, tail_lw, _cut, k_c = psislw_compact_batch(raw, m)
        np.testing.assert_allclose(np.asarray(k_c), np.asarray(k_d), atol=1e-12)
        lw = np.asarray(raw) - np.asarray(log_norm)[:, None]
        rows = np.arange(2)[:, None]
        lw[rows, np.asarray(tail_idx)] = np.asarray(tail_lw)
        np.testing.assert_allclose(lw, np.asarray(dense), rtol=0, atol=1e-12)

    def test_weighted_quantile_matches_dense(self):
        from pyloo_tpu.ops.expectations import weighted_quantile_batch
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        raw = rng.standard_t(df=3, size=(17, 500))
        h = rng.normal(size=(17, 500))
        probs = [0.1, 0.5, 0.9]
        compact = pl.psislw_compact(raw)
        dense, _ = _dense(raw)
        want = np.asarray(
            weighted_quantile_batch(
                jnp.asarray(h), jnp.asarray(dense), np.asarray(probs)
            )
        )
        got = compact.weighted_quantile(h, raw, probs)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
        # chunked row processing is value-identical
        got_chunked = compact.weighted_quantile(h, raw, probs, chunk_rows=5)
        np.testing.assert_allclose(got_chunked, want, rtol=1e-12, atol=1e-14)
        # scalar prob accepted
        got_scalar = compact.weighted_quantile(h, raw, 0.5)
        np.testing.assert_allclose(got_scalar[:, 0], want[:, 1], rtol=1e-12)
