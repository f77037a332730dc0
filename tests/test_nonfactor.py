"""Tests for loo_nonfactor (joint MVN/MVT conditional LOO)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy import stats

import pyloo_tpu as pl
from pyloo_tpu.ops.nonfactor import mvn_conditional_loglik, mvt_conditional_loglik


def brute_force_mvn_conditional(y, mu, cov):
    """Per-obs conditional density via explicit partitioned-normal formulas."""
    N = len(y)
    out = np.empty(N)
    for i in range(N):
        keep = np.delete(np.arange(N), i)
        c11 = cov[i, i]
        c12 = cov[np.ix_([i], keep)]
        c22 = np.linalg.inv(cov[np.ix_(keep, keep)])
        cond_mean = mu[i] + (c12 @ c22 @ (y[keep] - mu[keep]))[0]
        cond_var = c11 - (c12 @ c22 @ c12.T)[0, 0]
        out[i] = stats.norm.logpdf(y[i], cond_mean, np.sqrt(cond_var))
    return out


@pytest.fixture(scope="module")
def mvn_idata():
    rng = np.random.default_rng(42)
    N, C, T = 12, 2, 150
    A = rng.normal(size=(N, N)) * 0.3
    true_cov = A @ A.T + np.eye(N)
    true_mu = rng.normal(size=N)
    y = rng.multivariate_normal(true_mu, true_cov)

    # posterior draws jitter around the truth
    mus = true_mu[None, None, :] + rng.normal(0, 0.05, size=(C, T, N))
    covs = np.empty((C, T, N, N))
    for c in range(C):
        for t in range(T):
            jitter = rng.normal(0, 0.01, size=(N, N))
            covs[c, t] = true_cov + (jitter + jitter.T) / 2 + 0.01 * np.eye(N)
    idata = pl.from_dict(
        posterior={"mu": mus, "cov": covs},
        observed_data={"y": y},
    )
    return idata, y, mus, covs


class TestKernels:
    def test_mvn_matches_brute_force(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        S = 5
        mu_flat = mus.reshape(-1, len(y))[:S]
        cov_flat = covs.reshape(-1, len(y), len(y))[:S]
        got = np.asarray(mvn_conditional_loglik(y, mu_flat, cov=cov_flat))
        for s in range(S):
            want = brute_force_mvn_conditional(y, mu_flat[s], cov_flat[s])
            assert_allclose(got[s], want, rtol=1e-8)

    def test_prec_equals_cov_path(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        mu_flat = mus.reshape(-1, len(y))[:4]
        cov_flat = covs.reshape(-1, len(y), len(y))[:4]
        prec_flat = np.linalg.inv(cov_flat)
        a = np.asarray(mvn_conditional_loglik(y, mu_flat, cov=cov_flat))
        b = np.asarray(mvn_conditional_loglik(y, mu_flat, prec=prec_flat))
        assert_allclose(a, b, rtol=1e-6)

    def test_mvt_matches_direct_formula(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        N = len(y)
        mu_flat = mus.reshape(-1, N)[:3]
        cov_flat = covs.reshape(-1, N, N)[:3]
        df = np.array([5.0, 10.0, 30.0])
        got = np.asarray(
            mvt_conditional_loglik(y, mu_flat, df, cov=cov_flat)
        )
        # direct per-obs computation with explicit deletions
        for s in range(3):
            P = np.linalg.inv(cov_flat[s])
            r = y - mu_flat[s]
            g = P @ r
            cbar = np.diag(P)
            for i in range(N):
                keep = np.delete(np.arange(N), i)
                Pmm = P[np.ix_(keep, keep)]
                pcol = P[keep, i]
                eff = Pmm - np.outer(pcol, pcol) / P[i, i]
                beta = r[keep] @ eff @ r[keep]
                cond_df = df[s] + N - 1
                cond_loc = y[i] - g[i] / cbar[i]
                cond_scale = (df[s] + beta) / cond_df / cbar[i]
                from scipy.special import gammaln

                want = (
                    gammaln((cond_df + 1) / 2)
                    - gammaln(cond_df / 2)
                    - 0.5 * np.log(cond_df * np.pi * cond_scale)
                    - ((cond_df + 1) / 2)
                    * np.log(1 + (y[i] - cond_loc) ** 2 / (cond_scale * cond_df))
                )
                assert_allclose(got[s, i], want, rtol=1e-7)

    def test_mvt_invalid_df(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        N = len(y)
        out = np.asarray(
            mvt_conditional_loglik(
                y, mus.reshape(-1, N)[:1], np.array([-1.0]),
                cov=covs.reshape(-1, N, N)[:1],
            )
        )
        assert np.all(np.isneginf(out))


class TestLooNonfactor:
    def test_basic_run_and_report(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_nonfactor(idata, pointwise=True, reff=1.0)
        assert res["n_data_points"] == 12
        assert np.isfinite(res["elpd_loo"])
        assert res.attrs["is_mvn"]
        text = str(res)
        assert "non-factorized multivariate normal model" in text

    def test_student_t_report(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        C, T = mus.shape[:2]
        rng = np.random.default_rng(0)
        idata_t = pl.from_dict(
            posterior={
                "mu": mus, "cov": covs,
                "df": 10 + rng.uniform(size=(C, T)),
            },
            observed_data={"y": y},
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_nonfactor(
                idata_t, pointwise=True, reff=1.0, model_type="student_t"
            )
        assert np.isfinite(res["elpd_loo"])
        assert "Student-t" in str(res)

    def test_diagonal_cov_matches_factorized_loo(self):
        # with diagonal covariance the conditionals are the marginals,
        # so loo_nonfactor must agree with standard loo on the iid log-lik
        rng = np.random.default_rng(1)
        N, C, T = 10, 2, 200
        y = rng.normal(size=N)
        mus = rng.normal(0, 0.1, size=(C, T, N))
        sig2 = 1.0 + 0.1 * rng.uniform(size=(C, T))
        covs = np.einsum("ct,ij->ctij", sig2, np.eye(N))
        idata = pl.from_dict(
            posterior={"mu": mus, "cov": covs}, observed_data={"y": y}
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res_nf = pl.loo_nonfactor(idata, pointwise=True, reff=1.0)
        ll = (
            -0.5 * np.log(2 * np.pi * sig2[..., None])
            - 0.5 * (y[None, None, :] - mus) ** 2 / sig2[..., None]
        )
        idata_f = pl.from_dict(
            posterior={"mu": mus}, log_likelihood={"obs": ll}
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res_f = pl.loo(idata_f, pointwise=True, reff=1.0)
        assert_allclose(res_nf["elpd_loo"], res_f["elpd_loo"], rtol=1e-8)
        assert_allclose(res_nf.loo_i.values, res_f.loo_i.values, rtol=1e-8)

    def test_validation(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with pytest.raises(ValueError, match="not found"):
                pl.loo_nonfactor(idata, mu_var_name="missing", reff=1.0)
            no_cov = pl.from_dict(
                posterior={"mu": mus}, observed_data={"y": y}
            )
            with pytest.raises(ValueError, match="covariance"):
                pl.loo_nonfactor(no_cov, reff=1.0)
            with pytest.raises(ValueError, match="Degrees of freedom"):
                pl.loo_nonfactor(
                    idata, model_type="student_t", reff=1.0
                )
            with pytest.raises(ValueError, match="model_type"):
                pl.loo_nonfactor(idata, model_type="gamma", reff=1.0)


class TestNonfactorOptions:
    """Option/validation parity with the reference's nonfactor test battery
    (``pyloo/tests/base_tests/test_loo_nonfactor.py``)."""

    @staticmethod
    def _quiet(fn, *a, **kw):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return fn(*a, **kw)

    def test_precision_input_equals_cov_input(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        precs = np.linalg.inv(covs)
        idata_p = pl.from_dict(
            posterior={"mu": mus, "prec": precs},
            observed_data={"y": y},
        )
        r_cov = self._quiet(pl.loo_nonfactor, idata, pointwise=True, reff=1.0)
        r_prec = self._quiet(
            pl.loo_nonfactor, idata_p, pointwise=True, reff=1.0
        )
        assert_allclose(r_prec["elpd_loo"], r_cov["elpd_loo"], rtol=1e-8)
        assert_allclose(
            r_prec.loo_i.values, r_cov.loo_i.values, rtol=1e-7
        )

    def test_custom_var_names(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        renamed = pl.from_dict(
            posterior={"mean_vec": mus, "sigma_mat": covs},
            observed_data={"y": y},
        )
        r = self._quiet(
            pl.loo_nonfactor, renamed, pointwise=True, reff=1.0,
            mu_var_name="mean_vec", cov_var_name="sigma_mat",
        )
        base = self._quiet(pl.loo_nonfactor, idata, pointwise=True, reff=1.0)
        assert_allclose(r["elpd_loo"], base["elpd_loo"], rtol=1e-12)

    @pytest.mark.parametrize("method", ["sis", "tis"])
    def test_other_is_methods(self, mvn_idata, method):
        idata = mvn_idata[0]
        r = self._quiet(pl.loo_nonfactor, idata, reff=1.0, method=method)
        assert np.isfinite(r["elpd_loo"])

    @pytest.mark.parametrize(
        "scale,sign", [("log", 1.0), ("negative_log", -1.0), ("deviance", -2.0)]
    )
    def test_scales(self, mvn_idata, scale, sign):
        idata = mvn_idata[0]
        r_log = self._quiet(pl.loo_nonfactor, idata, reff=1.0, scale="log")
        r = self._quiet(pl.loo_nonfactor, idata, reff=1.0, scale=scale)
        assert_allclose(r["elpd_loo"], sign * r_log["elpd_loo"], rtol=1e-12)

    def test_invalid_scale_and_method(self, mvn_idata):
        idata = mvn_idata[0]
        with pytest.raises(TypeError):
            self._quiet(pl.loo_nonfactor, idata, scale="bogus")
        with pytest.raises(ValueError):
            self._quiet(pl.loo_nonfactor, idata, method="bogus")
        with pytest.raises(ValueError, match="model_type"):
            self._quiet(pl.loo_nonfactor, idata, model_type="laplace")

    def test_student_t_missing_df(self, mvn_idata):
        idata = mvn_idata[0]
        with pytest.raises((KeyError, ValueError)):
            self._quiet(
                pl.loo_nonfactor, idata, reff=1.0, model_type="student_t"
            )

    def test_student_t_negative_df_warns(self, mvn_idata):
        # reference loo_nonfactor.py:508-516: warn, give the bad draws -inf
        # log-lik, and keep going with the rest
        idata, y, mus, covs = mvn_idata
        C, T = mus.shape[:2]
        df = np.full((C, T), 7.0)
        df[0, :10] = -3.0
        bad = pl.from_dict(
            posterior={"mu": mus, "cov": covs, "df": df},
            observed_data={"y": y},
        )
        with warnings.catch_warnings():
            warnings.simplefilter("always")
            with pytest.warns(
                UserWarning, match="Non-positive degrees of freedom"
            ):
                r = pl.loo_nonfactor(
                    bad, reff=1.0, model_type="student_t", pointwise=True
                )
        assert np.isfinite(r["elpd_loo"])
        assert np.isfinite(r["p_loo"])

    def test_missing_mu_raises(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        no_mu = pl.from_dict(
            posterior={"cov": covs}, observed_data={"y": y}
        )
        with pytest.raises((KeyError, ValueError)):
            self._quiet(pl.loo_nonfactor, no_mu, reff=1.0)

    def test_missing_cov_and_prec_raises(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        no_cov = pl.from_dict(
            posterior={"mu": mus}, observed_data={"y": y}
        )
        with pytest.raises((KeyError, ValueError)):
            self._quiet(pl.loo_nonfactor, no_cov, reff=1.0)

    def test_no_observed_data_raises(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        bare = pl.from_dict(posterior={"mu": mus, "cov": covs})
        # reference raises TypeError ("Must be able to extract an
        # observed_data group", loo_nonfactor.py)
        with pytest.raises(TypeError, match="observed_data"):
            self._quiet(pl.loo_nonfactor, bare, reff=1.0)

    def test_manual_reff(self, mvn_idata):
        idata = mvn_idata[0]
        r1 = self._quiet(pl.loo_nonfactor, idata, reff=1.0)
        r2 = self._quiet(pl.loo_nonfactor, idata, reff=0.5)
        assert np.isfinite(r1["elpd_loo"]) and np.isfinite(r2["elpd_loo"])

    def test_no_pointwise_has_no_loo_i(self, mvn_idata):
        idata = mvn_idata[0]
        r = self._quiet(pl.loo_nonfactor, idata, pointwise=False, reff=1.0)
        assert "loo_i" not in r.index

    def test_always_warns_model_spec(self, mvn_idata):
        idata = mvn_idata[0]
        with pytest.warns(UserWarning, match="requires the correct model"):
            with warnings.catch_warnings():
                warnings.simplefilter("always")
                pl.loo_nonfactor(idata, reff=1.0)

    def test_mvt_precision_equals_cov(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        C, T = mus.shape[:2]
        df = np.full((C, T), 7.0)
        precs = np.linalg.inv(covs)
        id_cov = pl.from_dict(
            posterior={"mu": mus, "cov": covs, "df": df},
            observed_data={"y": y},
        )
        id_prec = pl.from_dict(
            posterior={"mu": mus, "prec": precs, "df": df},
            observed_data={"y": y},
        )
        r_cov = self._quiet(
            pl.loo_nonfactor, id_cov, pointwise=True, reff=1.0,
            model_type="student_t",
        )
        r_prec = self._quiet(
            pl.loo_nonfactor, id_prec, pointwise=True, reff=1.0,
            model_type="student_t",
        )
        assert_allclose(r_prec["elpd_loo"], r_cov["elpd_loo"], rtol=1e-7)


class TestDrawSharding:
    """Draw-axis sharding (SURVEY §5: nonfactor shards draws, not obs)."""

    def test_sharded_equals_single(self, mvn_idata):
        idata, y, mus, covs = mvn_idata
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            pl.rcParams["device.auto_shard"] = False
            try:
                r_single = pl.loo_nonfactor(idata, pointwise=True, reff=1.0)
            finally:
                pl.rcParams["device.auto_shard"] = True
            r_sharded = pl.loo_nonfactor(idata, pointwise=True, reff=1.0)
        assert_allclose(
            r_sharded["elpd_loo"], r_single["elpd_loo"], rtol=1e-12
        )
        assert_allclose(
            r_sharded.loo_i.values, r_single.loo_i.values, rtol=1e-12
        )
        assert_allclose(
            r_sharded.pareto_k.values, r_single.pareto_k.values, rtol=1e-10
        )

    def test_near_singular_draws_sharded(self):
        """Singular/near-singular covariance draws under the sharded path:
        the Cholesky failure semantics (-inf rows) must survive sharding."""
        rng = np.random.default_rng(7)
        N, C, T = 8, 2, 80
        A = rng.normal(size=(N, N)) * 0.4
        base = A @ A.T + np.eye(N)
        y = rng.multivariate_normal(np.zeros(N), base)
        mus = rng.normal(0, 0.05, size=(C, T, N))
        covs = np.broadcast_to(base, (C, T, N, N)).copy()
        covs[0, 0] = np.outer(np.ones(N), np.ones(N))  # rank-1: singular
        covs[1, 3] = base * 1e-14  # near-zero scale
        idata = pl.from_dict(
            posterior={"mu": mus, "cov": covs}, observed_data={"y": y}
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo_nonfactor(idata, pointwise=True, reff=1.0)
        assert np.isfinite(res["elpd_loo"])
