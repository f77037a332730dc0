"""Exactness of the segmented top-k cascade against lax.top_k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyloo_tpu.ops.selection import topk_vals_desc


@pytest.mark.parametrize(
    "shape,k",
    [
        ((7, 4000), 191),   # bench shape: G=4 cascade
        ((5, 4001), 191),   # ragged: needs -inf padding
        ((3, 2500), 100),   # non-multiple of segment width
        ((4, 1999), 191),   # below cascade threshold -> single stage
        ((2, 300), 40),     # small
        ((2, 64), 64),      # k == s -> full sort
        ((6, 8192), 499),   # wide, k just under segment/2
    ],
)
def test_matches_lax_topk(rng, shape, k):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    got = topk_vals_desc(x, k)
    want, _ = jax.lax.top_k(x, k)
    assert got.shape == (*shape[:-1], k)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0)


def test_ties_and_infs(rng):
    # duplicated values and -inf entries: the value multiset must match
    x = np.full((3, 4000), -np.inf, dtype=np.float32)
    x[0, :50] = 1.0  # fewer finite values than k
    x[1] = rng.integers(0, 5, size=4000)  # heavy ties
    x[2] = rng.normal(size=4000)
    got = np.asarray(topk_vals_desc(jnp.asarray(x), 191))
    want = np.asarray(jax.lax.top_k(jnp.asarray(x), 191)[0])
    assert_allclose(got, want, rtol=0)


def test_float64_path(rng):
    x = jnp.asarray(rng.normal(size=(4, 4000)), jnp.float64)
    got = topk_vals_desc(x, 191)
    want, _ = jax.lax.top_k(x, 191)
    assert got.dtype == jnp.float64
    assert_allclose(np.asarray(got), np.asarray(want), rtol=0)


def test_fast_kernel_unchanged_by_cascade(rng):
    # the fast LOO kernel must produce identical scores with the cascade
    # selection as with single-stage selection (exactness end-to-end)
    from pyloo_tpu.ops import tail_length
    from pyloo_tpu.ops.loo_kernels import loo_scores_psis, loo_scores_psis_fast

    ll = jnp.asarray(rng.normal(-1, 0.7, size=(64, 4000)), jnp.float32)
    m = tail_length(4000, 1.0)
    e_fast, k_fast, l_fast, _dg = loo_scores_psis_fast(ll, m)
    e_ref, k_ref, l_ref = loo_scores_psis(ll.astype(jnp.float64), m)
    assert_allclose(np.asarray(e_fast), np.asarray(e_ref), rtol=2e-4)
    assert_allclose(np.asarray(k_fast), np.asarray(k_ref), atol=2e-3)


def test_degenerate_gpd_fit_stays_finite():
    # Logistic-model chunk that historically produced a row whose GPD fit
    # cancels to b ~ 0 in float32 (sigma = -k/b becomes 0/0 noise).  The fit
    # must take the exponential limit (k=0, sigma=mean(z)) and the fast
    # kernel must stay finite and close to the exact float64 path.
    import jax

    from pyloo_tpu.ops import tail_length
    from pyloo_tpu.ops.loo_kernels import loo_scores_psis, loo_scores_psis_fast

    key = jax.random.PRNGKey(0)
    kb, kx = jax.random.split(key)
    beta = 0.05 * jax.random.normal(
        jax.random.fold_in(kb, 1), (400, 50), jnp.float32
    )
    kc = jax.random.fold_in(kx, 0)
    X = jax.random.normal(kc, (65536, 50), jnp.float32)
    y = jax.random.uniform(jax.random.fold_in(kc, 1), (65536, 1)) < 0.5
    logits = X @ beta.T
    ll = jnp.where(
        y, jax.nn.log_sigmoid(logits), jax.nn.log_sigmoid(-logits)
    )
    m = tail_length(400, 1.0)
    e, k, _, _dg = loo_scores_psis_fast(ll, m)
    assert bool(jnp.all(jnp.isfinite(e))), "fast kernel produced non-finite elpd"

    # spot-check parity on a subsample against the exact float64 kernel
    sub = ll[::512].astype(jnp.float64)
    e64, _, _ = loo_scores_psis(sub, m)
    assert_allclose(
        np.asarray(e[::512], np.float64), np.asarray(e64), rtol=2e-3
    )


class TestPallasKernels:
    """Interpret-mode exactness of the Pallas selection / prepass kernels
    (the TPU fast path dispatches to these for float32, B >= 1024)."""

    def test_topk_desc_exact(self):
        import jax
        import jax.numpy as jnp

        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

        x = jax.random.normal(jax.random.PRNGKey(0), (19, 4000), jnp.float32)
        x = x.at[0].set(0.25)  # full-row ties
        x = x.at[1].set(-jnp.inf)
        got = pallas_topk_desc(x, 191, interpret=True)
        want = jax.lax.top_k(x, 191)[0]
        same = (got == want) | (jnp.isneginf(got) & jnp.isneginf(want))
        assert bool(jnp.all(same))

    def test_loo_prepass_matches_xla(self):
        import jax
        import jax.numpy as jnp

        from pyloo_tpu.ops.lse import logsumexp
        from pyloo_tpu.ops.pallas_topk import pallas_loo_prepass

        rng = np.random.default_rng(0)
        ll = rng.normal(-1, 0.8, size=(16, 2000))
        ll[3] = -np.abs(rng.standard_t(2, size=2000)) * 3  # heavy tail row
        x_raw = jnp.asarray(-ll, jnp.float32)
        M = 191
        vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass(
            x_raw, M + 1, interpret=True
        )
        C = jnp.max(x_raw, axis=1)
        x = x_raw - C[:, None]
        want_vals = jax.lax.top_k(x, M + 1)[0]
        floor = float(np.log(np.finfo(np.float64).tiny))
        xc = jnp.maximum(want_vals[:, M], floor)
        mask = x <= xc[:, None]
        want_ntl = xc + jnp.log(
            jnp.sum(jnp.where(mask, jnp.exp(x - xc[:, None]), 0.0), axis=1)
        )
        assert bool(jnp.all(vals == want_vals))
        assert bool(jnp.all(c1 == C))
        np.testing.assert_allclose(
            np.asarray(log_ntl), np.asarray(want_ntl), rtol=2e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(log_sum_ll),
            np.asarray(logsumexp(-x_raw, axis=1)),
            rtol=2e-6,
            atol=1e-6,
        )


class TestTopkWithIdx:
    """Index-tracking cascade: values exact, indices point at those values."""

    @pytest.mark.parametrize(
        "shape,k",
        [
            ((7, 4000), 256),
            ((5, 4001), 191),
            ((3, 2500), 100),
            ((2, 300), 40),  # below cascade threshold -> lax.top_k
        ],
    )
    def test_values_and_index_consistency(self, rng, shape, k):
        from pyloo_tpu.ops.selection import topk_with_idx

        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        vals, idx = topk_with_idx(x, k)
        want, _ = jax.lax.top_k(x, k)
        assert_allclose(np.asarray(vals), np.asarray(want), rtol=0)
        gathered = jnp.take_along_axis(x, idx, axis=-1)
        assert_allclose(np.asarray(gathered), np.asarray(vals), rtol=0)
        # indices must be distinct per row
        for row in np.asarray(idx):
            assert len(set(row.tolist())) == k


class TestHybridF64:
    """Exact f64 top-k via f32-proxy selection + certificate."""

    @pytest.mark.parametrize("s", [1000, 4000, 4001])
    def test_random_exact_and_certified(self, rng, s):
        from pyloo_tpu.ops.selection import topk_hybrid_f64

        x = jnp.asarray(rng.normal(size=(16, s)))
        vals, ok = topk_hybrid_f64(x, 191)
        want, _ = jax.lax.top_k(x, 191)
        assert bool(jnp.all(ok))
        assert_allclose(np.asarray(vals), np.asarray(want), rtol=0)

    def test_sub_f32_resolution_spread_is_exact(self, rng):
        """f64-distinct values inside one f32 ulp, away from the boundary."""
        from pyloo_tpu.ops.selection import topk_hybrid_f64

        x = rng.normal(size=(4, 2000))
        # top block far above everything, mutually within 1e-12
        x[:, :50] = 10.0 + rng.uniform(0, 1e-12, size=(4, 50))
        x = jnp.asarray(x)
        vals, ok = topk_hybrid_f64(x, 100)
        want, _ = jax.lax.top_k(x, 100)
        assert bool(jnp.all(ok))
        assert_allclose(np.asarray(vals), np.asarray(want), rtol=0)

    def test_constant_rows_certified(self):
        from pyloo_tpu.ops.selection import topk_hybrid_f64

        x = jnp.zeros((3, 2000), jnp.float64)
        vals, ok = topk_hybrid_f64(x, 100)
        assert bool(jnp.all(ok))
        assert_allclose(np.asarray(vals), 0.0, rtol=0)

    def test_adversarial_boundary_tie_flagged(self, rng):
        """> PAD f64-distinct values in one f32 tie class AT the boundary:
        the certificate must refuse (ok=False) rather than silently err."""
        from pyloo_tpu.ops.selection import topk_hybrid_f64

        x = np.asarray(rng.normal(size=(2, 2000)) - 10.0)
        # 400 values all rounding to f32(1.0), f64-distinct, straddling the
        # k=100 boundary
        x[0, :400] = 1.0 + rng.uniform(0, 1e-9, size=400)
        x = jnp.asarray(x)
        vals, ok = topk_hybrid_f64(x, 100)
        ok = np.asarray(ok)
        assert not ok[0]
        assert ok[1]

    def test_exact_kernel_falls_back_on_adversarial_rows(self, rng):
        """End-to-end: loo_scores_psis stays exact when the certificate
        fails, via the full-width f64 fallback branch."""
        import warnings as _w

        from pyloo_tpu.ops import tail_length
        from pyloo_tpu.ops.loo_kernels import loo_scores_psis
        from pyloo_tpu.ops.psis import psislw_batch
        from pyloo_tpu.ops.lse import logsumexp

        ll = np.asarray(rng.normal(-1, 0.6, size=(8, 2000)))
        ll[0, :400] = -1.0 - rng.uniform(0, 1e-9, size=400)
        m = tail_length(2000, 1.0)
        llj = jnp.asarray(ll)
        e, k, l = loo_scores_psis(llj, m)
        lw, k_ref = psislw_batch(-llj, m)
        e_ref = logsumexp(lw + llj, axis=1)
        assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-11, atol=1e-12)
        assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-11)

    def test_minus_inf_rows(self, rng):
        from pyloo_tpu.ops.selection import topk_hybrid_f64

        x = np.full((2, 2000), -np.inf)
        x[0, :30] = rng.normal(size=30)
        x = jnp.asarray(x)
        vals, ok = topk_hybrid_f64(x, 100)
        want, _ = jax.lax.top_k(x, 100)
        got, expect = np.asarray(vals), np.asarray(want)
        assert_allclose(got[np.asarray(ok)], expect[np.asarray(ok)], rtol=0)


def _topk_want(x, k):
    """lax.top_k values with -inf/NaN-tolerant comparison helper."""
    want = jax.lax.top_k(x, k)[0]
    return np.asarray(want)


def _assert_same_vals(got, want):
    got, want = np.asarray(got), np.asarray(want)
    both_nan = np.isnan(got) & np.isnan(want)
    both_ninf = np.isneginf(got) & np.isneginf(want)
    eq = (got == want) | both_nan | both_ninf
    assert eq.all(), f"mismatch at {np.argwhere(~eq)[:5]}"


class TestPallasEnvelope:
    """Property battery across the widened kernel envelope (interpret mode).

    Shapes cover every segment count the kernel supports (1..64), both
    per-lane list heights (256 for k <= 256, 512 above), ragged widths,
    ragged batch sizes, and k at the boundaries {1, 255, 256, 257, 512}.
    """

    @pytest.mark.parametrize(
        "s,k",
        [
            (200, 1),       # n_segs=1, trivial k
            (256, 191),     # n_segs=1 exact fit
            (300, 255),     # n_segs=2 ragged, k at 255
            (512, 256),     # n_segs=2, k at the 256 boundary
            (2000, 191),    # n_segs=8 ragged (bench-adjacent)
            (4096, 256),    # n_segs=16 exact fit, max k for N=256
            (4097, 100),    # n_segs=32 just past the old 4096 limit
            pytest.param(8000, 270, marks=pytest.mark.slow),  # N=512
            pytest.param(8192, 512, marks=pytest.mark.slow),  # max k
            pytest.param(16000, 191, marks=pytest.mark.slow),
            pytest.param(16384, 257, marks=pytest.mark.slow),
            (513, 512),     # minimal width above one 512-list
        ],
    )
    def test_random_shapes(self, rng, s, k):
        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc, supports

        assert supports(s, k)
        x = jnp.asarray(rng.normal(size=(9, s)), jnp.float32)  # ragged B
        got = pallas_topk_desc(x, k, interpret=True, blk=1)
        _assert_same_vals(got, _topk_want(x, k))

    def test_supports_envelope(self):
        from pyloo_tpu.ops.pallas_topk import supports

        assert supports(8000, 270)      # the 4x2000-draw posterior
        assert supports(16384, 256)
        assert supports(32768, 512)
        assert not supports(16385, 256) or supports(16385, 257)
        assert supports(32769, 513)     # the 1024-tall tier picks up
        assert not supports(65537, 1024)  # S beyond 64 segments
        assert not supports(4000, 1025)   # k beyond the tallest list
        assert not supports(1, 1)       # degenerate width

    def test_ties_crossing_segment_boundaries(self, rng):
        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

        # tie runs deliberately spanning the 256-element segment boundary
        x = np.full((8, 1000), -1.0, np.float32)
        x[:, 200:300] = 2.0   # run across the seg-0/seg-1 boundary
        x[:, 500:520] = 3.0
        x[:, 760:780] = 2.0   # same value, different segment
        x += rng.normal(size=x.shape).astype(np.float32) * 1e-3
        x[2, :] = 5.0         # full-row tie
        xj = jnp.asarray(x)
        got = pallas_topk_desc(xj, 256, interpret=True, blk=1)
        _assert_same_vals(got, _topk_want(xj, 256))

    def test_inf_and_allequal_rows(self, rng):
        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

        x = np.asarray(rng.normal(size=(10, 2000)), np.float32)
        x[0, :] = -np.inf
        x[1, :100] = np.inf
        x[2, :] = 0.0
        x[3, ::2] = -np.inf            # alternating -inf
        x[4, :3] = np.float32(3.4e38)  # near f32 max
        xj = jnp.asarray(x)
        got = pallas_topk_desc(xj, 191, interpret=True, blk=1)
        _assert_same_vals(got, _topk_want(xj, 191))

    @pytest.mark.parametrize("b", [1, 2, 7, 32, 33])
    def test_ragged_batch(self, rng, b):
        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

        x = jnp.asarray(rng.normal(size=(b, 1500)), jnp.float32)
        got = pallas_topk_desc(x, 200, interpret=True, blk=1)
        _assert_same_vals(got, _topk_want(x, 200))

    @pytest.mark.parametrize(
        "s,k",
        [
            (2000, 191),
            (4097, 100),   # past the old 4096 limit
            pytest.param(8000, 270, marks=pytest.mark.slow),  # N=512 path
        ],
    )
    def test_prepass_shapes(self, rng, s, k):
        from pyloo_tpu.ops.lse import logsumexp
        from pyloo_tpu.ops.pallas_topk import pallas_loo_prepass

        ll = rng.normal(-1, 0.8, size=(9, s))
        x_raw = jnp.asarray(-ll, jnp.float32)
        vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass(
            x_raw, k, interpret=True, blk=1
        )
        C = jnp.max(x_raw, axis=1)
        x = x_raw - C[:, None]
        want_vals = jax.lax.top_k(x, k)[0]
        floor = float(np.log(np.finfo(np.float64).tiny))
        xc = jnp.maximum(want_vals[:, k - 1], floor)
        mask = x <= xc[:, None]
        want_ntl = xc + jnp.log(
            jnp.sum(jnp.where(mask, jnp.exp(x - xc[:, None]), 0.0), axis=1)
        )
        want_lse = logsumexp(jnp.asarray(ll, jnp.float32), axis=1)
        assert_allclose(np.asarray(c1), np.asarray(C), rtol=0)
        _assert_same_vals(vals, want_vals)
        assert_allclose(np.asarray(log_ntl), np.asarray(want_ntl), rtol=2e-6)
        assert_allclose(np.asarray(log_sum_ll), np.asarray(want_lse), rtol=2e-6)

    def test_prepass_heavy_tail_and_ties(self, rng):
        from pyloo_tpu.ops.pallas_topk import pallas_loo_prepass

        ll = rng.normal(-1, 0.8, size=(8, 2000))
        ll[0] = -np.abs(rng.standard_cauchy(size=2000)) * 5  # heavy tail
        ll[1] = -2.0  # constant row
        x_raw = jnp.asarray(-ll, jnp.float32)
        vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass(
            x_raw, 192, interpret=True, blk=1
        )
        C = jnp.max(x_raw, axis=1)
        want_vals = jax.lax.top_k(x_raw - C[:, None], 192)[0]
        _assert_same_vals(vals, want_vals)
        assert np.isfinite(np.asarray(log_sum_ll)).all()


class TestLargeSEnvelope:
    """S > 32768 regime: 1024-tall lists, the multipass draw-split merge,
    and the k-adaptive exact cascade (VERDICT r3 item 4 - no regime may be
    a silent fallback)."""

    def test_supports_1024_tier(self):
        from pyloo_tpu.ops.pallas_topk import multipass_parts, supports

        # the reff=1 PSIS tail k = 3*sqrt(S)+1 now fits one pass to S=65536
        assert supports(65536, 769)
        assert supports(65536, 1024)
        assert not supports(65537, 1024)      # S beyond 64 segments
        assert not supports(4000, 1025)       # k beyond the tallest list
        # multipass extends the S cap (never the k cap)
        assert multipass_parts(16384, 256) == 1
        assert multipass_parts(65537, 1024) == 2
        assert multipass_parts(100_000, 950) == 2
        assert multipass_parts(150_000, 200) == 10
        assert multipass_parts(100_000, 1087) is None   # k > 1024
        assert multipass_parts(2_000_000, 256) is None  # > 16 parts

    @pytest.mark.slow
    def test_topk_1024_list(self, rng):
        from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

        x = jnp.asarray(rng.normal(size=(3, 34_000)), jnp.float32)
        got = pallas_topk_desc(x, 600, interpret=True, blk=1)
        _assert_same_vals(got, _topk_want(x, 600))

    @pytest.mark.slow
    def test_prepass_65536_full_psis_tail(self, rng):
        from pyloo_tpu.ops.lse import logsumexp
        from pyloo_tpu.ops.pallas_topk import pallas_loo_prepass

        s, k = 65_536, 769  # S cap, reff=1 tail
        ll = rng.normal(-1, 0.8, size=(4, s))
        ll[1] = -np.abs(rng.standard_t(2, size=s)) * 3  # heavy tail row
        x_raw = jnp.asarray(-ll, jnp.float32)
        vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass(
            x_raw, k, interpret=True, blk=1
        )
        C = jnp.max(x_raw, axis=1)
        want_vals = jax.lax.top_k(x_raw - C[:, None], k)[0]
        _assert_same_vals(vals, want_vals)
        floor = float(np.log(np.finfo(np.float64).tiny))
        x = x_raw - C[:, None]
        xc = jnp.maximum(want_vals[:, k - 1], floor)
        want_ntl = xc + jnp.log(
            jnp.sum(jnp.where(x <= xc[:, None], jnp.exp(x - xc[:, None]), 0.0), axis=1)
        )
        want_lse = logsumexp(jnp.asarray(ll, jnp.float32), axis=1)
        assert_allclose(np.asarray(c1), np.asarray(C), rtol=0)
        assert_allclose(np.asarray(log_ntl), np.asarray(want_ntl), rtol=2e-6)
        assert_allclose(np.asarray(log_sum_ll), np.asarray(want_lse), rtol=2e-6)

    @pytest.mark.slow
    @pytest.mark.parametrize("s,k", [(40_000, 200), (70_000, 600)])
    def test_multipass_prepass_matches_oracle(self, rng, s, k):
        from pyloo_tpu.ops.lse import logsumexp
        from pyloo_tpu.ops.pallas_topk import (
            multipass_parts,
            pallas_loo_prepass_multi,
        )

        parts = multipass_parts(s, k)
        assert parts and parts > 1
        ll = rng.normal(-1, 0.8, size=(5, s))
        ll[2] = -np.abs(rng.standard_cauchy(size=s)) * 4  # heavy tail
        x_raw = jnp.asarray(-ll, jnp.float32)
        vals, c1, log_ntl, log_sum_ll = pallas_loo_prepass_multi(
            x_raw, k, parts=parts, interpret=True, blk=1
        )
        C = jnp.max(x_raw, axis=1)
        x = x_raw - C[:, None]
        want_vals = jax.lax.top_k(x, k)[0]
        # parts without the global max rebase by (C_p - C): one extra f32
        # rounding vs the oracle's direct x - C, so close, not bit-equal
        assert_allclose(
            np.asarray(vals), np.asarray(want_vals), rtol=2e-6, atol=2e-5
        )
        floor = float(np.log(np.finfo(np.float64).tiny))
        xc = jnp.maximum(want_vals[:, k - 1], floor)
        want_ntl_mass = jnp.sum(
            jnp.where(x <= xc[:, None], jnp.exp(x), 0.0), axis=1
        )
        want_lse = logsumexp(jnp.asarray(ll, jnp.float32), axis=1)
        assert_allclose(np.asarray(c1), np.asarray(C), rtol=0)
        assert_allclose(
            np.asarray(jnp.exp(log_ntl)), np.asarray(want_ntl_mass), rtol=5e-6
        )
        assert_allclose(np.asarray(log_sum_ll), np.asarray(want_lse), rtol=2e-6)

    @pytest.mark.slow
    def test_multipass_ties_across_part_boundaries(self, rng):
        from pyloo_tpu.ops.pallas_topk import pallas_loo_prepass_multi

        s, k, parts = 40_000, 150, 3  # forced split: parts > needed
        x = np.full((4, s), -2.0, np.float32)
        # tie runs straddling the part_s boundaries (ceil(40000/3)=13334)
        x[:, 13_300:13_400] = 1.5
        x[:, 26_600:26_700] = 1.5
        x[0, :] = 3.25                         # full-row tie
        x[1, ::113] = 4.0                      # spread spikes, every part
        x += rng.normal(size=x.shape).astype(np.float32) * 1e-3
        xj = jnp.asarray(x)
        vals, c1, log_ntl, _ = pallas_loo_prepass_multi(
            xj, k, parts=parts, interpret=True, blk=1
        )
        C = jnp.max(xj, axis=1)
        want_vals = jax.lax.top_k(xj - C[:, None], k)[0]
        _assert_same_vals(vals, want_vals)
        assert np.isfinite(np.asarray(log_ntl)).all()

    def test_cascade_adapts_to_large_k(self, rng):
        # k = 769 with fixed 1000-wide segments used to degrade to a
        # full-width single-stage sort; the width now scales with k and the
        # result stays exact
        x = jnp.asarray(rng.normal(size=(6, 70_000)), jnp.float32)
        got = topk_vals_desc(x, 769)
        _assert_same_vals(got, _topk_want(x, 769))

    def test_fast_path_route(self, monkeypatch):
        from pyloo_tpu.ops import selection

        # CPU: always the portable cascade
        assert selection.fast_path_route(4096, 4000, 192, jnp.float32) == "cascade"

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        route = selection.fast_path_route
        assert route(4096, 4000, 192, jnp.float32) == "pallas"
        assert route(4096, 65_536, 769, jnp.float32) == "pallas"
        assert route(4096, 100_000, 950, jnp.float32) == "pallas-multipass"
        assert route(4096, 100_000, 1087, jnp.float32) == "cascade"  # k cap
        assert route(64, 4000, 192, jnp.float32) == "cascade"        # B gate
        assert route(4096, 4000, 192, jnp.float64) == "cascade"      # dtype

