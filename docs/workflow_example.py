"""End-to-end workflow: define a model, fit, diagnose, and repair LOO.

Runs on CPU in ~2 minutes:  python docs/workflow_example.py

Covers the full repair ladder for problematic observations:
PSIS-LOO -> moment matching -> exact refits (reloo) -> K-fold CV,
plus model comparison and LOO-weighted expectations.
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import pyloo_tpu as pl
from pyloo_tpu.models.wrapper import Model, fit

warnings.simplefilter("ignore")

# --- 1. a model with an influential outlier --------------------------------
rng = np.random.default_rng(0)
y = rng.normal(1.0, 1.0, size=40)
y[0] = 9.0  # will break the PSIS approximation for observation 0


def logp(p, d):
    """Location-scale normal with weak priors, unconstrained via log sigma."""
    s = jnp.exp(p["log_s"])
    resid = (d["y"] - p["mu"]) / s
    prior = -0.5 * (p["mu"] / 10) ** 2 - 0.5 * (p["log_s"] / 2) ** 2
    return prior + jnp.sum(
        -0.5 * jnp.log(2 * jnp.pi) - p["log_s"] - 0.5 * resid**2
    )


def log_lik(p, d):
    s = jnp.exp(p["log_s"])
    resid = (d["y"] - p["mu"]) / s
    return -0.5 * jnp.log(2 * jnp.pi) - p["log_s"] - 0.5 * resid**2


model = Model(
    name="location_scale",
    data={"y": y},
    param_shapes={"mu": (), "log_s": ()},
    logp=logp,
    log_lik=log_lik,
    constrain=lambda p: {"mu": p["mu"], "sigma": jnp.exp(p["log_s"])},
    obs_keys=("y",),
)

# --- 2. sample the posterior (one jitted HMC program) ----------------------
idata = fit(model, draws=500, tune=700, chains=4, seed=7)
wrapper = pl.JAXModelWrapper(model, idata, sample_kwargs=dict(
    draws=500, tune=700, chains=4, seed=11,
))

# --- 3. PSIS-LOO with diagnostics -------------------------------------------
loo_res = pl.loo(idata, pointwise=True)
print(loo_res)
bad = int(np.argmax(loo_res.pareto_k.values))
print(f"\nworst observation: {bad} (k = {loo_res.pareto_k.values[bad]:.2f})")

# --- 4. repair option A: moment matching (no refits) ------------------------
mm = pl.loo_moment_match(wrapper, loo_res, split=True, cov=True)
print(
    f"\nmoment matching: max k {loo_res.pareto_k.values.max():.2f} ->"
    f" {mm.pareto_k.values.max():.2f}, elpd {loo_res['elpd_loo']:.2f} ->"
    f" {mm['elpd_loo']:.2f}"
)

# --- 5. repair option B: exact refits for the bad observations --------------
rel = pl.reloo(wrapper, loo_orig=loo_res, k_thresh=0.7, verbose=False)
print(f"reloo: elpd {loo_res['elpd_loo']:.2f} -> {rel['elpd_loo']:.2f}")

# --- 6. repair option C: exact K-fold CV -------------------------------------
kf = pl.loo_kfold(wrapper, K=5, random_seed=0)
print(f"5-fold CV: elpd_kfold = {kf['elpd_kfold']:.2f} (se {kf['se']:.2f})")

# --- 7. compare against a robust alternative model ---------------------------


def logp_t(p, d):
    """Student-t(5) likelihood absorbs the outlier."""
    s = jnp.exp(p["log_s"])
    resid = (d["y"] - p["mu"]) / s
    prior = -0.5 * (p["mu"] / 10) ** 2 - 0.5 * (p["log_s"] / 2) ** 2
    df = 5.0
    return prior + jnp.sum(
        jax.scipy.special.gammaln((df + 1) / 2)
        - jax.scipy.special.gammaln(df / 2)
        - 0.5 * jnp.log(df * jnp.pi)
        - p["log_s"]
        - ((df + 1) / 2) * jnp.log1p(resid**2 / df)
    )


def log_lik_t(p, d):
    s = jnp.exp(p["log_s"])
    resid = (d["y"] - p["mu"]) / s
    df = 5.0
    return (
        jax.scipy.special.gammaln((df + 1) / 2)
        - jax.scipy.special.gammaln(df / 2)
        - 0.5 * jnp.log(df * jnp.pi)
        - p["log_s"]
        - ((df + 1) / 2) * jnp.log1p(resid**2 / df)
    )


model_t = Model(
    "robust_t", {"y": y}, {"mu": (), "log_s": ()}, logp_t, log_lik_t,
    obs_keys=("y",),
)
idata_t = fit(model_t, draws=500, tune=700, chains=4, seed=7)
df = pl.loo_compare({"normal": idata, "student_t": idata_t})
print("\nmodel comparison:")
print(df[["rank", "elpd_loo", "weight", "elpd_diff", "dse"]].round(3).to_string())

# --- 8. LOO-weighted expectations -------------------------------------------
ll = idata.log_likelihood.obs.stack(__sample__=("chain", "draw"))
lw, k = pl.psislw(-ll)
post_mu = pl.e_loo(
    idata, group="posterior", var_name="mu", log_weights=lw, log_ratios=-ll
)
print(
    f"\nLOO-weighted E[mu | y_-i] range:"
    f" [{post_mu.value.values.min():.3f}, {post_mu.value.values.max():.3f}]"
)

# --- 9. streaming LOO: log-likelihood computed on device, never stored ------
# For datasets whose (n_obs, n_draws) matrix would not fit anywhere, give
# loo_streaming a traceable generator; it evaluates + scores chunk by chunk.
flat = idata.sample_stats._flat_draws.values.reshape(-1, 2)  # (S, [mu, log_s])
mu_d, log_s_d = jnp.asarray(flat[:, 0]), jnp.asarray(flat[:, 1])
y_dev = jnp.asarray(y)


def log_lik_fn(obs_idx):  # (chunk,) int32 -> (chunk, S)
    resid = (y_dev[obs_idx, None] - mu_d[None, :]) / jnp.exp(log_s_d)[None, :]
    return (
        -0.5 * resid**2 - log_s_d[None, :] - 0.5 * jnp.log(2 * jnp.pi)
    )


stream = pl.loo_streaming(
    log_lik_fn, n_obs=len(y), n_draws=flat.shape[0], dtype=jnp.float64
)
print(f"\nstreaming elpd_loo: {stream['elpd_loo']:.2f} (se {stream['se']:.2f})")

sub = pl.loo_subsample_streaming(
    log_lik_fn, n_obs=len(y), n_draws=flat.shape[0],
    observations=min(50, len(y)), seed=1, dtype=jnp.float64,
)
print(
    f"subsampled streaming elpd_loo: {sub['elpd_loo']:.2f}"
    f" (subsampling SE {sub['subsampling_SE']:.2f})"
)
