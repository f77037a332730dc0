"""Final-coverage batch: secondary paths not exercised elsewhere."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl
from pyloo_tpu.models.wrapper import Model


def test_elpddata_copy_deep_independent():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = pl.loo(pl.load_example_data("centered_eight"), pointwise=True)
    dup = res.copy(deep=True)
    dup.loo_i.values[0] = 99.0
    assert res.loo_i.values[0] != 99.0
    shallow = res.copy(deep=False)
    assert shallow["elpd_loo"] == res["elpd_loo"]


def test_elpddata_constructor_preserved():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = pl.loo(pl.load_example_data("centered_eight"))
    sliced = res[["elpd_loo", "se"]]
    assert isinstance(sliced, pl.ELPDData)


def test_apply_rowwise_single_output(rng):
    from pyloo_tpu.ops.lse import logsumexp
    from pyloo_tpu.parallel import apply_rowwise

    x = rng.normal(size=(33, 64))
    (out,) = apply_rowwise(
        lambda b: (logsumexp(b, axis=1),), x, n_outputs=1, mesh=None,
        chunk_bytes=64 * 8 * 10,
    )
    from scipy.special import logsumexp as sp

    assert_allclose(np.asarray(out), sp(x, axis=1), rtol=1e-12)


def test_model_subset_observations(rng):
    y = np.arange(12.0)
    m = Model(
        "m", {"y": y, "w": y * 2}, {"mu": ()},
        lambda p, d: -0.5 * p["mu"] ** 2,
        lambda p, d: -((d["y"] - p["mu"]) ** 2),
        obs_keys=("y", "w"),
    )
    sub = m.subset_observations(np.array([0, 5, 7]))
    assert sub.data["y"].tolist() == [0.0, 5.0, 7.0]
    assert sub.data["w"].tolist() == [0.0, 10.0, 14.0]
    assert sub.n_obs == 3
    # ravel/unravel roundtrip
    q = rng.normal(size=m.flat_dim)
    again = np.asarray(m.ravel(m.unravel(jnp.asarray(q))))
    assert_allclose(again, q)


def test_advi_fullrank_logq_matches_scipy(rng):
    from scipy import stats

    from pyloo_tpu.models import ADVI

    y = rng.normal(1.0, 1.0, size=200)
    m = Model(
        "m", {"y": y}, {"mu": (), "log_s": ()},
        lambda p, d: -0.01 * p["mu"] ** 2 - 0.1 * p["log_s"] ** 2 + jnp.sum(
            -p["log_s"] - 0.5 * ((d["y"] - p["mu"]) / jnp.exp(p["log_s"])) ** 2
        ),
        lambda p, d: -p["log_s"]
        - 0.5 * ((d["y"] - p["mu"]) / jnp.exp(p["log_s"])) ** 2,
        obs_keys=("y",),
    )
    advi = ADVI(m, "fullrank")
    res = advi.fit(n=800, draws=200, seed=0)
    flat = res.idata.sample_stats._flat_draws.values.reshape(-1, 2)
    log_q = advi.compute_log_q()
    cov = res.L @ res.L.T
    expected = stats.multivariate_normal.logpdf(flat, mean=res.mean, cov=cov)
    assert_allclose(log_q, expected, rtol=1e-6, atol=1e-8)


def test_plot_loo_on_waic_results():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = pl.waic(pl.load_example_data("centered_eight"), pointwise=True)
    ax = pl.plot_loo(w, show_elpd=True)  # waic_i fallback in elpd mode
    assert ax.get_ylabel() == "ELPD"
    plt.close("all")


def test_importance_sampling_result_container(rng):
    from pyloo_tpu.psis import ImportanceSamplingResult

    r = ImportanceSamplingResult(
        samples=rng.normal(size=(10, 3)),
        log_weights=rng.normal(size=10),
        pareto_k=0.3,
    )
    assert r.method == "psis"
    assert r.warnings == []


def test_loo_score_scrps_definition(rng):
    # scrps = -EXy/EXX - 0.5 log EXX, checked against the crps components
    from pyloo_tpu.loo_score import _crps

    EXX = np.array([1.0, 2.0])
    EXy = np.array([0.4, 0.8])
    crps = _crps(EXX, EXy, scale=False)
    scrps = _crps(EXX, EXy, scale=True)
    assert_allclose(crps, 0.5 * EXX - EXy)
    assert_allclose(scrps, -EXy / EXX - 0.5 * np.log(EXX))


def test_reference_import_paths_resolve():
    """Drop-in imports from the reference package layout all resolve:
    pyloo.wrapper / pyloo.wrapper.pymc / pyloo.estimators / 
    pyloo.approximations exports (reference __init__ files)."""
    from pyloo_tpu.wrapper import Laplace, PyMCWrapper  # noqa: F401
    from pyloo_tpu.wrapper.pymc import PyMCWrapper as P2  # noqa: F401
    from pyloo_tpu.approximations import (  # noqa: F401
        LooApproximation,
        compute_point_estimate,
        thin_draws,
        PLPDApproximation,
        LPDApproximation,
        TISApproximation,
        SISApproximation,
    )
    from pyloo_tpu.estimators import (  # noqa: F401
        EstimatorProtocol,
        DiffEstimate,
        HHEstimate,
        SRSEstimate,
        hh_estimate_elpd_loo,
        srs_estimate_elpd_loo,
    )
    import numpy as np

    pe = compute_point_estimate({"m": np.ones((2, 10)), "b": np.zeros((2, 10, 4))})
    assert pe["m"].shape == () and pe["b"].shape == (4,)
