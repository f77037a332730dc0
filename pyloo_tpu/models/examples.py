"""Example models: eight schools, roaches (Poisson), wells (logistic).

Functional JAX counterparts of the reference test-model fixtures
(``pyloo/tests/models.py:14-61`` eight schools, ``:426-461`` roaches,
``:495-530`` wells).  Datasets roaches.csv / wells.csv are the classic
Gelman & Hill (2007) regression examples bundled with the reference.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from .wrapper import Model

__all__ = [
    "eight_schools_centered",
    "eight_schools_noncentered",
    "roaches_model",
    "wells_model",
    "EIGHT_SCHOOLS_Y",
    "EIGHT_SCHOOLS_SIGMA",
]

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

EIGHT_SCHOOLS_Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
EIGHT_SCHOOLS_SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def _normal_logpdf(x, mu, sigma):
    return -0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma) - 0.5 * ((x - mu) / sigma) ** 2


def eight_schools_centered(data=None) -> Model:
    """Centered parameterization: theta_j ~ N(mu, tau) (funnel geometry).

    ``theta`` tracks the number of observations, so the model carries a
    ``builder`` and can be refit on data subsets (k-fold CV, reloo).
    """
    if data is None:
        data = {"y": EIGHT_SCHOOLS_Y, "sigma": EIGHT_SCHOOLS_SIGMA}
    n = len(np.asarray(data["y"]))

    def logp(params, data):
        mu, log_tau, theta = params["mu"], params["log_tau"], params["theta"]
        tau = jnp.exp(log_tau)
        lp = _normal_logpdf(mu, 0.0, 5.0)
        # half-Cauchy(5) prior on tau, plus log|d tau / d log_tau| = log_tau
        lp += jnp.log(2.0) - jnp.log(jnp.pi * 5.0 * (1 + (tau / 5.0) ** 2)) + log_tau
        lp += jnp.sum(_normal_logpdf(theta, mu, tau))
        lp += jnp.sum(_normal_logpdf(data["y"], theta, data["sigma"]))
        return lp

    def log_lik(params, data):
        return _normal_logpdf(data["y"], params["theta"], data["sigma"])

    def constrain(params):
        return {
            "mu": params["mu"],
            "theta": params["theta"],
            "tau": jnp.exp(params["log_tau"]),
        }

    return Model(
        name="eight_schools_centered",
        data=data,
        param_shapes={"mu": (), "log_tau": (), "theta": (n,)},
        logp=logp,
        log_lik=log_lik,
        constrain=constrain,
        obs_keys=("y", "sigma"),
        builder=eight_schools_centered,
    )


def eight_schools_noncentered(data=None) -> Model:
    """Non-centered parameterization: theta = mu + tau * theta_tilde."""
    if data is None:
        data = {"y": EIGHT_SCHOOLS_Y, "sigma": EIGHT_SCHOOLS_SIGMA}
    n = len(np.asarray(data["y"]))

    def theta_of(params):
        return params["mu"] + jnp.exp(params["log_tau"]) * params["theta_t"]

    def logp(params, data):
        mu, log_tau, theta_t = params["mu"], params["log_tau"], params["theta_t"]
        tau = jnp.exp(log_tau)
        lp = _normal_logpdf(mu, 0.0, 5.0)
        lp += jnp.log(2.0) - jnp.log(jnp.pi * 5.0 * (1 + (tau / 5.0) ** 2)) + log_tau
        lp += jnp.sum(_normal_logpdf(theta_t, 0.0, 1.0))
        lp += jnp.sum(_normal_logpdf(data["y"], theta_of(params), data["sigma"]))
        return lp

    def log_lik(params, data):
        return _normal_logpdf(data["y"], theta_of(params), data["sigma"])

    def constrain(params):
        return {
            "mu": params["mu"],
            "theta": theta_of(params),
            "tau": jnp.exp(params["log_tau"]),
        }

    return Model(
        name="eight_schools_noncentered",
        data=data,
        param_shapes={"mu": (), "log_tau": (), "theta_t": (n,)},
        logp=logp,
        log_lik=log_lik,
        constrain=constrain,
        obs_keys=("y", "sigma"),
        builder=eight_schools_noncentered,
    )


def _read_csv(name):
    import pandas as pd

    return pd.read_csv(os.path.join(_DATA_DIR, name))


def roaches_model() -> Model:
    """Poisson regression on the pest-control roaches data (262 obs).

    y ~ Poisson(exp(X @ beta + intercept + log(exposure))), sqrt-transformed
    pre-treatment roach count; matches the reference fixture
    (``pyloo/tests/models.py:426-461``).
    """
    df = _read_csv("roaches.csv")
    X = np.column_stack(
        [np.sqrt(df["roach1"].values), df["treatment"].values, df["senior"].values]
    )
    y = df["y"].values.astype(np.float64)
    offset = np.log(df["exposure2"].values)

    def logp(params, data):
        beta, intercept = params["beta"], params["intercept"]
        eta = data["X"] @ beta + intercept + data["offset"]
        lp = jnp.sum(_normal_logpdf(beta, 0.0, 2.5))
        lp += _normal_logpdf(intercept, 0.0, 5.0)
        lp += jnp.sum(data["y"] * eta - jnp.exp(eta) - gammaln(data["y"] + 1.0))
        return lp

    def log_lik(params, data):
        eta = data["X"] @ params["beta"] + params["intercept"] + data["offset"]
        return data["y"] * eta - jnp.exp(eta) - gammaln(data["y"] + 1.0)

    return Model(
        name="roaches",
        data={"X": X, "y": y, "offset": offset},
        param_shapes={"beta": (3,), "intercept": ()},
        logp=logp,
        log_lik=log_lik,
        obs_keys=("X", "y", "offset"),
    )


def wells_model() -> Model:
    """Logistic regression on the arsenic wells data (3020 obs).

    switch ~ Bernoulli(logit = X @ beta), X = [1, dist/100, arsenic];
    matches the reference fixture (``pyloo/tests/models.py:495-530``).
    """
    df = _read_csv("wells.csv")
    X = np.column_stack(
        [np.ones(len(df)), df["dist"].values / 100.0, df["arsenic"].values]
    )
    y = df["switch"].values.astype(np.float64)

    def logp(params, data):
        beta = params["beta"]
        eta = data["X"] @ beta
        lp = jnp.sum(_normal_logpdf(beta, 0.0, 1.0))
        lp += jnp.sum(data["y"] * eta - jnp.logaddexp(0.0, eta))
        return lp

    def log_lik(params, data):
        eta = data["X"] @ params["beta"]
        return data["y"] * eta - jnp.logaddexp(0.0, eta)

    return Model(
        name="wells",
        data={"X": X, "y": y},
        param_shapes={"beta": (3,)},
        logp=logp,
        log_lik=log_lik,
        obs_keys=("X", "y"),
    )
