"""Edge-path coverage: deprecated groups, index semantics, warnings."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pyloo_tpu as pl
from pyloo_tpu.containers import DataArray, Dataset, InferenceData
from pyloo_tpu.utils import reshape_draws


class TestDeprecatedLogLikelihood:
    def test_sample_stats_fallback(self, rng):
        ll = rng.normal(size=(2, 100, 5))
        idata = InferenceData(
            posterior=Dataset(
                {"mu": DataArray(rng.normal(size=(2, 100)), ("chain", "draw"))}
            ),
            sample_stats=Dataset(
                {
                    "log_likelihood": DataArray(
                        ll, ("chain", "draw", "obs_dim")
                    )
                }
            ),
        )
        with pytest.warns(DeprecationWarning, match="deprecated"):
            out = pl.get_log_likelihood(idata)
        assert out.shape == (2, 100, 5)

    def test_multiple_vars_requires_name(self, rng):
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 50))},
            log_likelihood={
                "a": rng.normal(size=(2, 50, 3)),
                "b": rng.normal(size=(2, 50, 4)),
            },
        )
        with pytest.raises(TypeError, match="var_name cannot"):
            pl.get_log_likelihood(idata)
        out = pl.get_log_likelihood(idata, var_name="b")
        assert out.shape == (2, 50, 4)
        with pytest.raises(TypeError, match="No log likelihood data named"):
            pl.get_log_likelihood(idata, var_name="c")


class TestReshapeDraws:
    def test_roundtrip(self, rng):
        x = rng.normal(size=(10, 4, 3))
        flat, ids = reshape_draws(x)
        assert flat.shape == (40, 3)
        assert ids is None
        chain_ids = np.repeat(np.arange(4), 10)
        back, ids2 = reshape_draws(flat, chain_ids)
        assert back.shape == (10, 4, 3)


class TestWrapperIndexSemantics:
    @pytest.fixture(scope="class")
    def wrapper(self, ):
        import jax.numpy as jnp

        from pyloo_tpu.models.wrapper import Model

        y = np.arange(10.0)
        m = Model(
            "m", {"y": y}, {"mu": ()},
            lambda p, d: -0.5 * p["mu"] ** 2,
            lambda p, d: -((d["y"] - p["mu"]) ** 2),
            obs_keys=("y",),
        )
        return pl.JAXModelWrapper(m)

    def test_int_index(self, wrapper):
        sel, rem = wrapper.select_observations(3)
        assert sel["y"].tolist() == [3.0]
        assert 3.0 not in rem["y"]

    def test_array_index(self, wrapper):
        sel, rem = wrapper.select_observations(np.array([1, 4]))
        assert sel["y"].tolist() == [1.0, 4.0]
        assert len(rem["y"]) == 8

    def test_slice_index(self, wrapper):
        sel, rem = wrapper.select_observations(slice(0, 3))
        assert sel["y"].tolist() == [0.0, 1.0, 2.0]

    def test_bool_mask(self, wrapper):
        mask = np.zeros(10, dtype=bool)
        mask[[2, 7]] = True
        sel, rem = wrapper.select_observations(mask)
        assert sel["y"].tolist() == [2.0, 7.0]

    def test_out_of_range(self, wrapper):
        with pytest.raises(IndexError):
            wrapper.select_observations(99)

    def test_reset_data(self, wrapper):
        _, rem = wrapper.select_observations(0)
        wrapper.set_data(rem)
        assert wrapper.n_obs == 9
        wrapper.reset_data()
        assert wrapper.n_obs == 10


class TestCompareWarnings:
    def test_ic_mismatch_with_precomputed(self):
        idata = pl.load_example_data("centered_eight")
        nc = pl.load_example_data("non_centered_eight")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            e1 = pl.waic(idata, pointwise=True)
            e2 = pl.waic(nc, pointwise=True)
        with pytest.warns(UserWarning, match="Using ic from precomputed"):
            df = pl.loo_compare({"a": e1, "b": e2}, ic="loo")
        assert "elpd_waic" in df.columns


class TestSubsampleThinning:
    def test_loo_approximation_draws(self, rng):
        mu = rng.normal(-1, 0.2, size=500)
        ll = mu[None, None, :] + rng.normal(0, 0.3, size=(2, 200, 500))
        idata = pl.from_dict(
            posterior={"mu": rng.normal(size=(2, 200))},
            log_likelihood={"obs": ll},
        )
        np.random.seed(0)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            full = pl.loo_subsample(
                idata, observations=100, loo_approximation="lpd", reff=1.0
            )
            np.random.seed(0)
            thin = pl.loo_subsample(
                idata, observations=100, loo_approximation="lpd",
                loo_approximation_draws=100, reff=1.0,
            )
        # thinned approximation: close but not identical estimates
        assert abs(full["elpd_loo"] - thin["elpd_loo"]) < 5 * full["subsampling_SE"] + 5


class TestMixturePrint:
    def test_mixture_report(self):
        idata = pl.load_example_data("centered_eight")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = pl.loo(idata, mixture=True, reff=1.0)
        text = str(res)
        assert "mixture posterior" in text
        assert "p_loo" not in text


def test_single_draw_rejected(rng):
    with pytest.raises(ValueError, match="at least 2 draws"):
        pl.psislw(rng.normal(size=(2, 1)))
