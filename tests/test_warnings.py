"""Warning-message parity with the reference, plus no-warning assertions.

The reference's observable behavior includes dozens of exact warning
conditions and texts which its tests assert via ``pytest.warns`` and a
``does_not_warn`` context manager (``pyloo/tests/helpers.py:12-23``).  Each
test here pins one condition AND its complement (clean inputs must stay
silent).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyloo_tpu as pl

from .helpers import does_not_warn


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def make_idata(rng, n_obs=25, sd=0.3, heavy=False):
    if heavy:
        z = rng.standard_t(df=1.5, size=(2, 400, n_obs))
        ll = -np.abs(z)
    else:
        ll = rng.normal(-1.0, sd, size=(2, 400, n_obs))
    return pl.from_dict(
        posterior={"mu": rng.normal(size=(2, 400))},
        log_likelihood={"obs": ll},
    )


class TestLooWarnings:
    def test_nan_warning_text(self, rng):
        ll = rng.normal(-1.0, 0.3, size=(2, 400, 10))
        ll[0, 0, 0] = np.nan
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 400))},
            log_likelihood={"obs": ll},
        )
        # reference loo.py:221-224
        with pytest.warns(UserWarning, match="NaN values detected in log-likelihood"):
            pl.loo(idata, reff=1.0)

    def test_high_k_warning_text(self, rng):
        idata = make_idata(rng, heavy=True)
        # reference loo.py:295-304
        with pytest.warns(
            UserWarning,
            match="Estimated shape parameter of Pareto distribution is greater than",
        ):
            pl.loo(idata, reff=1.0)

    def test_clean_input_does_not_warn(self, rng):
        idata = make_idata(rng)
        with does_not_warn(UserWarning):
            pl.loo(idata, reff=1.0)

    def test_non_psis_method_warns(self, rng):
        idata = make_idata(rng)
        # reference loo.py:239-242
        with pytest.warns(UserWarning, match="PSIS is the\n? ?recommended method"):
            pl.loo(idata, reff=1.0, method="sis")

    def test_mixture_warns(self, rng):
        idata = make_idata(rng)
        # reference loo.py:253-257
        with pytest.warns(UserWarning, match="Mix-IS-LOO requires a model"):
            pl.loo(idata, reff=1.0, mixture=True)


class TestWaicWarnings:
    def test_high_p_waic_warns(self, rng):
        # per-obs var of log-lik > 0.4 (reference waic.py:149-155)
        ll = rng.normal(-1.0, 2.0, size=(2, 400, 10))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 400))},
            log_likelihood={"obs": ll},
        )
        with pytest.warns(
            UserWarning,
            match="posterior variance of the log predictive densities exceeds",
        ):
            pl.waic(idata)

    def test_clean_waic_does_not_warn(self, rng):
        idata = make_idata(rng, sd=0.1)
        with does_not_warn(UserWarning):
            pl.waic(idata)


class TestSubsampleWarnings:
    def test_clean_subsample_quiet(self, rng):
        idata = make_idata(rng, n_obs=200, sd=0.1)
        with does_not_warn(UserWarning):
            pl.loo_subsample(
                idata, observations=50, reff=1.0, loo_approximation="lpd",
                seed=1,
            )


class TestFastPathDegeneracyDiagnostic:
    """The float32 fast path reports rows whose GPD fit degenerated
    (sigma <= 0 -> unsmoothed tail).  Natural triggers are near-impossible
    since the fit's cancellation fallback, so the plumbing is tested by
    stubbing the kernel's degeneracy output."""

    @staticmethod
    def _stub(real_kernel, degen_rows):
        def kernel(ll, tail_max):
            e, k, l, d = real_kernel(ll, tail_max)
            d = jnp.zeros_like(d).at[jnp.asarray(degen_rows)].set(True)
            return e, k, l, d

        return kernel

    def test_loo_warns_and_reports(self, monkeypatch, rng):
        import sys

        from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast

        loo_mod = sys.modules["pyloo_tpu.loo"]
        monkeypatch.setattr(
            loo_mod, "loo_scores_psis_fast",
            self._stub(loo_scores_psis_fast, [1, 3]),
        )
        ll = rng.normal(-1, 0.5, size=(2, 100, 7))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 100))},
            log_likelihood={"obs": ll},
        )
        pl.rcParams["device.precision"] = "float32"
        try:
            with pytest.warns(UserWarning, match="unsmoothed"):
                res = pl.loo(idata, pointwise=True, reff=1.0)
        finally:
            pl.rcParams["device.precision"] = "float64"
        assert res.fast_path_degenerate == 2

    def test_loo_f64_reports_zero(self, rng):
        ll = rng.normal(-1, 0.5, size=(2, 100, 7))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 100))},
            log_likelihood={"obs": ll},
        )
        res = pl.loo(idata, pointwise=True, reff=1.0)
        assert res.fast_path_degenerate == 0

    def test_streaming_warns_and_reports(self, monkeypatch, rng):
        import pyloo_tpu.streaming as s_mod
        from pyloo_tpu.ops.loo_kernels import loo_scores_psis_fast

        monkeypatch.setattr(
            s_mod, "loo_scores_psis_fast",
            self._stub(loo_scores_psis_fast, [0]),
        )
        ll_dev = jnp.asarray(
            rng.normal(-1, 0.5, size=(48, 64)), jnp.float32
        )
        with pytest.warns(UserWarning, match="unsmoothed"):
            res = pl.loo_streaming(
                lambda i: ll_dev[i], 48, 64,
                chunk_size=16, dtype=jnp.float32,
            )
        # one stubbed degenerate row per chunk
        assert res.fast_path_degenerate == 3
