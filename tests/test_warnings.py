"""Warning-message parity with the reference, plus no-warning assertions.

The reference's observable behavior includes dozens of exact warning
conditions and texts which its tests assert via ``pytest.warns`` and a
``does_not_warn`` context manager (``pyloo/tests/helpers.py:12-23``).  Each
test here pins one condition AND its complement (clean inputs must stay
silent).
"""

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
