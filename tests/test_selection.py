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
    e_fast, k_fast, l_fast = loo_scores_psis_fast(ll, m)
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
    e, k, _ = loo_scores_psis_fast(ll, m)
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
