"""Integration tests: real-data models fit by our HMC, full LOO workflows.

The counterpart of the reference's tier-3 PyMC-sampled fixtures (SURVEY.md
§4): roaches Poisson regression and wells logistic regression fit end-to-end,
then the BASELINE.json config-2 workflows run on them.
"""

import warnings

import numpy as np
import pytest

import pyloo_tpu as pl
from pyloo_tpu.models import roaches_model, wells_model
from pyloo_tpu.models.wrapper import fit

FAST = dict(draws=400, tune=500, chains=2)


@pytest.fixture(scope="module")
def roaches_idata():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fit(roaches_model(), seed=42, **FAST)


@pytest.fixture(scope="module")
def wells_idata():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fit(wells_model(), seed=42, **FAST)


class TestRoaches:
    def test_loo_psis_sis_tis_waic(self, roaches_idata):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(roaches_idata, pointwise=True)
            res_sis = pl.loo(roaches_idata, method="sis")
            res_tis = pl.loo(roaches_idata, method="tis")
            res_waic = pl.waic(roaches_idata)
        assert res["n_data_points"] == 262
        assert np.isfinite(res["elpd_loo"])
        # poisson regression on overdispersed counts: known to show bad k
        # values (the reference's fixture is chosen for exactly that)
        assert res.pareto_k.values.max() > 0.5
        for r in (res_sis, res_tis):
            assert np.isfinite(r["elpd_loo"])
            assert abs(r["elpd_loo"] - res["elpd_loo"]) / abs(res["elpd_loo"]) < 0.15
        assert np.isfinite(res_waic["elpd_waic"])

    def test_posterior_sane(self, roaches_idata):
        beta = roaches_idata.posterior.beta.values
        # treatment effect (index 1) is negative in this classic analysis
        assert beta[..., 1].mean() < 0


class TestWells:
    def test_loo_and_subsample(self, wells_idata):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(wells_idata, pointwise=True)
            np.random.seed(0)
            sub = pl.loo_subsample(wells_idata, observations=400)
        assert res["n_data_points"] == 3020
        assert res.pareto_k.values.max() < 0.7  # logistic regression: benign
        z = abs(sub["elpd_loo"] - res["elpd_loo"]) / sub["subsampling_SE"]
        assert z < 4.0
        np.random.seed(1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sub_hh = pl.loo_subsample(
                wells_idata, observations=400, estimator="hh_pps"
            )
        z_hh = abs(sub_hh["elpd_loo"] - res["elpd_loo"]) / sub_hh["subsampling_SE"]
        assert z_hh < 4.0

    def test_posterior_sane(self, wells_idata):
        beta = wells_idata.posterior.beta.values
        assert beta[..., 1].mean() < 0  # distance decreases switching
        assert beta[..., 2].mean() > 0  # arsenic increases switching


class TestWellsVariationalWorkflow:
    """Wells logistic regression through ADVI -> loo_approximate_posterior
    (reference ``test_loo_approximate_posterior.py:312-372``: wells with
    meanfield and fullrank ADVI)."""

    @pytest.mark.parametrize("method", ["meanfield", "fullrank"])
    def test_wells_advi_loo(self, method):
        from pyloo_tpu.models import ADVI, compute_log_weights, wells_model

        model = wells_model()
        advi = ADVI(model, method=method)
        res = advi.fit(n=3000, draws=800, seed=0)
        log_p = advi.compute_log_p()
        log_q = advi.compute_log_q()
        assert np.all(np.isfinite(log_p)) and np.all(np.isfinite(log_q))
        lw = compute_log_weights(advi)
        assert np.isfinite(np.asarray(lw)).all()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = pl.loo_approximate_posterior(
                res.idata, log_p=log_p, log_q=log_q, reff=1.0, seed=0
            )
            plain = pl.loo(res.idata, reff=1.0)
        assert np.isfinite(r["elpd_loo"])
        # a decent variational fit keeps the correction modest
        assert (
            abs(r["elpd_loo"] - plain["elpd_loo"]) / abs(plain["elpd_loo"])
            < 0.05
        )
