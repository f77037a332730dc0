"""Time-series workflow: leave-future-out CV, calibration, diagnostics.

Runs on CPU in ~2 minutes:  python docs/timeseries_example.py

Covers the pyloo_tpu extensions beyond the reference package:
loo_lfo (PSIS-forward LFO with refit-on-high-k), loo_compare over LFO
results, generic held-out elpd(), loo_pit + plot_loo_pit calibration,
and the pareto_k_* / mcse_loo diagnostic helpers.
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import pyloo_tpu as pl
from pyloo_tpu.models.wrapper import JAXModelWrapper, Model, idata_from_flat_draws

warnings.simplefilter("ignore")

# --- 1. a drifting time series ---------------------------------------------
rng = np.random.default_rng(3)
N, S, L = 48, 2000, 16
y = 0.6 + rng.normal(size=N)
y[30:] += 2.0  # regime shift: a static-mean model degrades mid-series

SIGMA, TAU = 1.0, 10.0


def posterior(y_hist):
    lam = 1 / TAU**2 + len(y_hist) / SIGMA**2
    return (np.sum(y_hist) / SIGMA**2) / lam, lam


def draws_for(y_hist, s, seed):
    m, lam = posterior(y_hist)
    return m + np.random.default_rng(seed).normal(size=s) / np.sqrt(lam)


# --- 2. approximate LFO from a single fit on the first L points ------------
mu0 = draws_for(y[:L], S, seed=0)
ll = -0.5 * np.log(2 * np.pi) - (y[:, None] - mu0[None, :]) ** 2 / 2
idata = pl.from_dict(
    posterior={"mu": mu0.reshape(1, S)},
    log_likelihood={"obs": ll.T.reshape(1, S, N)},
)
lfo_approx = pl.loo_lfo(idata, L, pointwise=True)
print(lfo_approx)
print("high-k targets:", pl.pareto_k_ids(lfo_approx))

# --- 3. exact refits where PSIS degrades ------------------------------------


def model_logp(p, d):
    import jax.numpy as jnp

    mu = p["mu"][0]
    return -0.5 * mu**2 / TAU**2 - 0.5 * jnp.sum((d["y"] - mu) ** 2)


def model_ll(p, d):
    import jax.numpy as jnp

    mu = p["mu"][0]
    return -0.5 * jnp.log(2 * jnp.pi) - (d["y"] - mu) ** 2 / 2


def conjugate_sampler(model, s=S, seed=1, **_):
    mu = draws_for(np.asarray(model.data["y"]), s, seed)
    return idata_from_flat_draws(model, mu.reshape(1, s, 1))


model = Model("ts", {"y": y}, {"mu": (1,)}, model_logp, model_ll,
              obs_keys=("y",))
wrapper = JAXModelWrapper(model, sample_kwargs={"sampler": conjugate_sampler})
lfo_refit = pl.loo_lfo(L=L, wrapper=wrapper, k_threshold=0.6, pointwise=True)
print(lfo_refit)
print("refits at:", np.asarray(lfo_refit["refit_indices"]))

# --- 4. compare against a deliberately biased alternative -------------------
mu_biased = mu0 - 1.5
ll_b = -0.5 * np.log(2 * np.pi) - (y[:, None] - mu_biased[None, :]) ** 2 / 2
idata_b = pl.from_dict(
    posterior={"mu": mu_biased.reshape(1, S)},
    log_likelihood={"obs": ll_b.T.reshape(1, S, N)},
)
lfo_b = pl.loo_lfo(idata_b, L, pointwise=True)
print(pl.loo_compare({"fit": lfo_approx, "biased": lfo_b}))

# --- 5. calibration + diagnostics on the exchangeable view ------------------
y_hat = mu0[None, :] + rng.normal(size=(N, S))  # posterior predictive draws
pit = pl.loo_pit(idata, y=y, y_hat=y_hat)
print("LOO-PIT head:", np.round(pit.values[:8], 3))
print(pl.pareto_k_table(pl.loo(idata, pointwise=True)))
print("mcse(elpd_loo) =", round(pl.mcse_loo(idata), 4))
print("min PSIS ESS  =", round(float(pl.psis_ess_values(idata).min()), 1))

# held-out scoring of the last 8 points under the first-L fit
held = pl.from_dict(
    log_likelihood={"obs": ll.T[:, -8:].reshape(1, S, 8)}
)
print(pl.elpd(held))

import matplotlib

matplotlib.use("Agg")
ax = pl.plot_loo_pit(pit)
ax.figure.savefig("/tmp/loo_pit_example.png", dpi=80)
print("wrote /tmp/loo_pit_example.png")
