"""JAXModelWrapper battery (reference ``wrapper_tests/test_pymc_wrapper.py``:
data immutability, select/set round-trips, log_likelihood_i index semantics,
transform round-trips, introspection)."""

import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

import pyloo_tpu as pl
from pyloo_tpu.models.wrapper import Model, fit, idata_from_flat_draws


def make_model(n=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=n)
    y = 1.0 + 0.5 * X + rng.normal(0, 0.5, size=n)

    def logp(p, d):
        mu = p["a"] + p["b"] * d["X"]
        return (
            -0.5 * (p["a"] / 5) ** 2
            - 0.5 * (p["b"] / 5) ** 2
            + jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - mu) ** 2)
        )

    def ll(p, d):
        mu = p["a"] + p["b"] * d["X"]
        return -0.5 * jnp.log(2 * jnp.pi) - 0.5 * (d["y"] - mu) ** 2

    return Model(
        "linreg2",
        {"X": X, "y": y},
        {"a": (), "b": ()},
        logp,
        ll,
        constrain=lambda p: {"a": p["a"], "b": p["b"]},
        obs_keys=("X", "y"),
    )


def exact_sampler(model, draws=500, chains=2, seed=0, **_):
    # crude but deterministic posterior stand-in for wrapper mechanics tests
    rng = np.random.default_rng(seed)
    flat = rng.normal([1.0, 0.5], 0.1, size=(chains, draws, 2))
    return idata_from_flat_draws(model, flat)


@pytest.fixture()
def wrapper():
    m = make_model()
    idata = exact_sampler(m, seed=3)
    return pl.JAXModelWrapper(
        m, idata, sample_kwargs=dict(sampler=exact_sampler, seed=4)
    )


class TestWrapperData:
    def test_initialization_and_introspection(self, wrapper):
        assert wrapper.n_obs == 20
        assert wrapper.get_observed_name() == "y"
        assert wrapper.get_variable_names() == ["a", "b"]
        assert wrapper.get_shapes() == {"a": (), "b": ()}
        assert wrapper.get_observed_data().shape == (20,)
        assert set(wrapper.observed_data) == {"X", "y"}

    def test_original_data_immutable(self, wrapper):
        with pytest.raises(ValueError):
            wrapper._original_data["y"][0] = 99.0

    def test_set_reset_round_trip(self, wrapper):
        orig_y = wrapper.get_observed_data().copy()
        wrapper.set_data({"y": orig_y * 2, "X": wrapper.model.data["X"]})
        assert_allclose(wrapper.get_observed_data(), orig_y * 2)
        wrapper.reset_data()
        assert_allclose(wrapper.get_observed_data(), orig_y)

    @pytest.mark.parametrize(
        "indices",
        [3, [0, 5, 7], slice(2, 8), np.arange(20) % 4 == 0],
        ids=["int", "list", "slice", "boolmask"],
    )
    def test_select_observations_index_semantics(self, wrapper, indices):
        selected, remaining = wrapper.select_observations(indices)
        n_sel = len(selected["y"])
        assert n_sel + len(remaining["y"]) == 20
        # selected + remaining partition the data exactly
        joined = np.sort(np.concatenate([selected["y"], remaining["y"]]))
        assert_allclose(joined, np.sort(wrapper.get_observed_data()))

    def test_select_out_of_range(self, wrapper):
        with pytest.raises(IndexError):
            wrapper.select_observations([25])
        with pytest.raises(IndexError):
            wrapper.select_observations([-1])


class TestWrapperLogLik:
    def test_log_likelihood_i_int_and_array(self, wrapper):
        idata = wrapper.idata
        ll1 = wrapper.log_likelihood_i(4, idata)
        assert ll1.shape[-1] == 1
        ll3 = wrapper.log_likelihood_i(np.array([1, 4, 9]), idata)
        assert ll3.shape[-1] == 3
        # the int path is the first column of the array path
        assert_allclose(ll3[..., 1], ll1[..., 0], rtol=1e-12)

    def test_log_likelihood_i_matches_model(self, wrapper):
        idata = wrapper.idata
        ll = wrapper.log_likelihood_i(0, idata)  # (C, T, 1)
        draws = idata.sample_stats._flat_draws.values
        d = wrapper.model.data
        mu = draws[..., 0] + draws[..., 1] * d["X"][0]
        want = -0.5 * np.log(2 * np.pi) - 0.5 * (d["y"][0] - mu) ** 2
        assert_allclose(ll[..., 0], want, rtol=1e-10)

    def test_log_likelihood_i_on_refit(self, wrapper):
        selected, remaining = wrapper.select_observations([2])
        wrapper.set_data(remaining)
        try:
            idata_new = wrapper.sample_posterior()
            ll = wrapper.log_likelihood_i(
                {"X": selected["X"], "y": selected["y"]}, idata_new
            )
            assert ll.shape[-1] == 1
            assert np.isfinite(ll).all()
        finally:
            wrapper.reset_data()
        assert wrapper.n_obs == 20


class TestWrapperTransforms:
    def test_unconstrained_constrained_round_trip(self):
        # model with a constrained parameter (sigma > 0)
        rng = np.random.default_rng(1)
        y = rng.normal(2.0, 1.5, size=30)

        def logp(p, d):
            s = jnp.exp(p["log_s"])
            return (
                -0.5 * (p["mu"] / 10) ** 2
                - 0.5 * (p["log_s"] / 2) ** 2
                + jnp.sum(
                    -0.5 * jnp.log(2 * jnp.pi)
                    - p["log_s"]
                    - 0.5 * ((d["y"] - p["mu"]) / s) ** 2
                )
            )

        def ll(p, d):
            s = jnp.exp(p["log_s"])
            return (
                -0.5 * jnp.log(2 * jnp.pi)
                - p["log_s"]
                - 0.5 * ((d["y"] - p["mu"]) / s) ** 2
            )

        m = Model(
            "ls2", {"y": y}, {"mu": (), "log_s": ()}, logp, ll,
            constrain=lambda p: {"mu": p["mu"], "sigma": jnp.exp(p["log_s"])},
            obs_keys=("y",),
        )
        idata = fit(m, draws=200, tune=200, chains=2, seed=0)
        w = pl.JAXModelWrapper(m, idata)
        upars = w.get_unconstrained_parameters()  # (S, 2)
        cons = w.get_constrained_parameters()
        assert_allclose(
            np.exp(upars[:, 1]).reshape(cons["sigma"].shape),
            cons["sigma"],
            rtol=1e-12,
        )
        assert np.all(cons["sigma"] > 0)

    def test_flat_draws_match_posterior(self, wrapper):
        upars = wrapper.get_unconstrained_parameters()
        cons = wrapper.get_constrained_parameters()
        assert_allclose(
            upars[:, 0], cons["a"].reshape(-1), rtol=1e-12
        )
        assert_allclose(
            upars[:, 1], cons["b"].reshape(-1), rtol=1e-12
        )


class TestWrapperSampling:
    def test_sampler_hook_and_seed_override(self, wrapper):
        i1 = wrapper.sample_posterior()
        i2 = wrapper.sample_posterior(seed=4)
        assert_allclose(
            i1.sample_stats._flat_draws.values,
            i2.sample_stats._flat_draws.values,
        )
        i3 = wrapper.sample_posterior(seed=99)
        assert not np.allclose(
            i1.sample_stats._flat_draws.values,
            i3.sample_stats._flat_draws.values,
        )

    def test_reloo_restores_data_on_failure(self, wrapper):
        def exploding_sampler(model, **kw):
            raise RuntimeError("sampler exploded")

        bad = pl.JAXModelWrapper(
            wrapper.model, wrapper.idata,
            sample_kwargs=dict(sampler=exploding_sampler),
        )
        before = bad.get_observed_data().copy()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                pl.reloo(bad, k_thresh=0.0, verbose=False)
            except Exception:
                pass
        assert_allclose(bad.get_observed_data(), before)
        assert bad.n_obs == 20


def test_pymcwrapper_alias_and_type_error():
    """Reference name-compat: `PyMCWrapper` subclasses JAXModelWrapper
    (round 5: it additionally accepts a live pm.Model through the PyTensor
    JAX-backend adapter) and still rejects arbitrary objects with a
    porting hint."""
    import pyloo_tpu as pl

    assert issubclass(pl.PyMCWrapper, pl.JAXModelWrapper)
    with pytest.raises(TypeError, match="jittable"):
        pl.PyMCWrapper(object())
