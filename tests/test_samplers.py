"""Sampler validation: closed-form posterior recovery with R-hat/ESS gates.

Plays the role of the reference's reliance on ``pm.sample`` (NUTS) fixtures
(``pyloo/tests/models.py:14-61``): the bundled HMC and ChEES samplers must
recover known posteriors within Monte Carlo error and pass standard
convergence diagnostics, so every workflow built on refits (kfold, reloo,
moment matching) rests on validated draws.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pyloo_tpu  # noqa: F401  (enables x64)
from pyloo_tpu.models.wrapper import Model, fit
from pyloo_tpu.ops.ess import ess_mean, rhat


# NOTE: the XLA:CPU full-suite-scale compile segfault first isolated here
# (NUTS is the largest program in the suite) is now mitigated globally by
# conftest's per-module ``_bounded_live_executables`` cache clear.

SETTINGS = dict(draws=400, tune=400, chains=4)


def conjugate_model(y, prior_sd=10.0):
    def logp(p, d):
        mu = p["mu"]
        return -0.5 * (mu / prior_sd) ** 2 + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - mu) ** 2
        )

    def ll(p, d):
        return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - p["mu"]) ** 2

    return Model(
        "conj", {"y": np.asarray(y, float)}, {"mu": ()}, logp, ll,
        obs_keys=("y",),
    )


def correlated_gaussian_model(rho=0.8):
    """2-D N(mu0, Sigma) target with known mean and covariance."""
    mu0 = np.array([1.0, -2.0])
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = np.linalg.inv(cov)

    def logp(p, d):
        x = jnp.stack([p["a"], p["b"]]) - d["mu0"]
        return -0.5 * x @ d["prec"] @ x

    def ll(p, d):  # unused; single pseudo-observation
        return jnp.reshape(logp(p, d), (1,))

    return Model(
        "corr",
        {"mu0": mu0, "prec": prec, "y": np.zeros(1)},
        {"a": (), "b": ()},
        logp,
        ll,
        obs_keys=("y",),
    ), mu0, cov


class TestHmcRecovery:
    @pytest.fixture(scope="class", params=["hmc", "chees", "nuts"])
    def conj_fit(self, request):
        rng = np.random.default_rng(11)
        y = rng.normal(2.0, 1.0, size=40)
        m = conjugate_model(y)
        kw = {
            "hmc": dict(num_leapfrog=16),
            "chees": dict(max_leapfrog=64),
            "nuts": dict(max_depth=6),
        }[request.param]
        idata = fit(m, seed=5, algorithm=request.param, **kw, **SETTINGS)
        prec = 1.0 / 100.0 + len(y)
        return idata, y.sum() / prec, 1.0 / np.sqrt(prec), request.param

    def test_posterior_mean_and_sd(self, conj_fit):
        idata, true_mean, true_sd, algo = conj_fit
        mu = idata.posterior.mu.values  # (C, T)
        e = float(ess_mean(mu))
        mc_err = true_sd / np.sqrt(max(e, 1.0))
        assert abs(mu.mean() - true_mean) < 5 * mc_err, (
            f"{algo}: mean {mu.mean():.4f} vs {true_mean:.4f} (mc {mc_err:.4f})"
        )
        assert abs(mu.std() / true_sd - 1.0) < 0.15, (
            f"{algo}: sd {mu.std():.4f} vs {true_sd:.4f}"
        )

    def test_convergence_diagnostics(self, conj_fit):
        idata, _, _, algo = conj_fit
        mu = idata.posterior.mu.values
        r = rhat(mu)
        e = float(ess_mean(mu))
        assert r < 1.02, f"{algo}: R-hat {r:.4f}"
        assert e > 0.1 * mu.size, f"{algo}: ESS {e:.0f} of {mu.size}"

    def test_accept_rate_reasonable(self, conj_fit):
        idata, _, _, algo = conj_fit
        acc = float(idata.sample_stats.accept_rate.values.mean())
        assert 0.4 < acc <= 1.0, f"{algo}: accept rate {acc:.2f}"


class TestCorrelatedRecovery:
    def test_mean_and_covariance(self):
        m, mu0, cov = correlated_gaussian_model()
        idata = fit(
            m, seed=3, algorithm="hmc", num_leapfrog=24,
            compute_log_likelihood=False, **SETTINGS
        )
        a = idata.posterior.a.values
        b = idata.posterior.b.values
        assert rhat(a) < 1.03 and rhat(b) < 1.03
        draws = np.stack([a.ravel(), b.ravel()])
        got_mean = draws.mean(axis=1)
        got_cov = np.cov(draws)
        e = min(float(ess_mean(a)), float(ess_mean(b)))
        mc = 1.0 / np.sqrt(max(e, 1.0))
        assert np.all(np.abs(got_mean - mu0) < 6 * mc)
        assert abs(got_cov[0, 1] / cov[0, 1] - 1.0) < 0.25
        assert np.all(np.abs(np.diag(got_cov) - 1.0) < 0.25)


class TestRhat:
    def test_rhat_near_one_for_iid(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 1000))
        assert abs(rhat(x) - 1.0) < 0.01

    def test_rhat_flags_unmixed_chains(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 500)) + np.array([[0.0], [0.0], [3.0], [3.0]])
        assert rhat(x) > 1.5

    def test_rhat_shape_validation(self):
        with pytest.raises(ValueError, match="chain, draw"):
            rhat(np.zeros(10))


class TestNuts:
    def test_tree_depth_and_divergence_stats(self):
        import jax.numpy as jnp

        from pyloo_tpu.models.nuts import sample_nuts

        draws, acc, stats = sample_nuts(
            lambda q: -0.5 * jnp.sum(q**2), np.zeros(3),
            num_warmup=300, num_samples=300, num_chains=2, seed=0,
            full_stats=True,
        )
        assert draws.shape == (2, 300, 3)
        assert 0.6 < acc <= 1.0
        assert stats["tree_depth"].max() <= 8
        assert stats["tree_depth"].mean() >= 1
        assert stats["diverging"].mean() < 0.05

    def test_correlated_gaussian_recovery(self):
        import jax.numpy as jnp

        from pyloo_tpu.models.nuts import sample_nuts

        rho = 0.9
        prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
        pj = jnp.asarray(prec)
        draws, acc = sample_nuts(
            lambda q: -0.5 * q @ pj @ q, np.zeros(2),
            num_warmup=600, num_samples=1200, num_chains=4, seed=7,
        )
        d = draws.reshape(-1, 2)
        cov = np.cov(d.T)
        corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
        assert abs(corr - rho) < 0.05
        assert abs(cov[0, 0] - 1.0) < 0.2
        assert rhat(draws[:, :, 0]) < 1.02

    def test_mass_matrix_handles_scale_mismatch(self):
        from pyloo_tpu.models.nuts import sample_nuts

        def lp(q):
            return -0.5 * (q[0] / 10.0) ** 2 - 0.5 * (q[1] * 10.0) ** 2

        draws, acc = sample_nuts(
            lp, np.zeros(2), num_warmup=500, num_samples=500,
            num_chains=4, seed=2,
        )
        d = draws.reshape(-1, 2)
        assert abs(d[:, 0].std() / 10.0 - 1.0) < 0.15
        assert abs(d[:, 1].std() / 0.1 - 1.0) < 0.15

    def test_through_fit_interface(self):
        m = conjugate_model(np.random.default_rng(0).normal(2, 1, 30))
        idata = fit(
            m, draws=300, tune=300, chains=2, seed=4, algorithm="nuts",
            max_depth=6,
        )
        mu = idata.posterior.mu.values
        assert mu.shape == (2, 300)
        assert rhat(mu) < 1.05


class TestCheesJitter:
    """Per-chain step-size jitter (round-3 ChEES productionizing)."""

    def test_jitter_validation(self):
        from pyloo_tpu.models.chees import sample_chees

        with pytest.raises(ValueError, match="step_size_jitter"):
            sample_chees(lambda q: -0.5 * q[0] ** 2, np.zeros(1),
                         step_size_jitter=1.5)
        with pytest.raises(ValueError, match="step_size_jitter"):
            sample_chees(lambda q: -0.5 * q[0] ** 2, np.zeros(1),
                         step_size_jitter=-0.1)

    def test_heavy_jitter_still_recovers(self):
        # jitter=0.5 stresses the accept-reject correction: the posterior
        # must stay exact regardless of per-chain step-size perturbation
        from pyloo_tpu.models.chees import sample_chees

        def lp(q):
            return -0.5 * jnp.sum(q**2)

        draws, acc = sample_chees(
            lp, np.zeros(2), num_warmup=400, num_samples=400,
            num_chains=8, max_leapfrog=64, step_size_jitter=0.5, seed=7,
        )
        d = draws.reshape(-1, 2)
        assert abs(d.mean()) < 0.1
        assert abs(d.std() - 1.0) < 0.1
        assert 0.4 < acc <= 1.0
        assert rhat(draws[:, :, 0]) < 1.02

    def test_many_chain_default(self):
        import inspect

        from pyloo_tpu.models.chees import sample_chees

        sig = inspect.signature(sample_chees)
        assert sig.parameters["num_chains"].default == 16
        assert sig.parameters["step_size_jitter"].default == 0.2

    def test_fit_defaults_per_algorithm(self):
        # fit() without chains= gives ChEES its many-chain default (the
        # trajectory-length gradient is a cross-chain expectation) while
        # HMC/NUTS keep the conventional 4
        m = conjugate_model(np.random.default_rng(1).normal(0, 1, 20))
        id_chees = fit(m, draws=20, tune=40, seed=3, algorithm="chees")
        assert id_chees.posterior.mu.values.shape[0] == 16
        id_hmc = fit(m, draws=20, tune=40, seed=3, algorithm="hmc")
        assert id_hmc.posterior.mu.values.shape[0] == 4
