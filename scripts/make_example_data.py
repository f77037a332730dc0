"""Generate the bundled example posteriors (eight schools, centered + non-centered).

Run from the repo root:  python scripts/make_example_data.py

The draws are produced by pyloo_tpu's own HMC with fixed seeds and written to
pyloo_tpu/data/*.npz; they play the role of arviz's load_arviz_data
("centered_eight"/"non_centered_eight") datasets used throughout the
reference tests and README quickstarts.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyloo_tpu.models import eight_schools_centered, eight_schools_noncentered
from pyloo_tpu.models.wrapper import fit
from pyloo_tpu.ops.ess import ess_mean

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "pyloo_tpu", "data")


def dump(name, model, seed, **kw):
    idata = fit(model, draws=500, tune=1500, chains=4, seed=seed, **kw)
    out = {
        "posterior/mu": idata.posterior.mu.values,
        "posterior/theta": idata.posterior.theta.values,
        "posterior/tau": idata.posterior.tau.values,
        "log_likelihood/obs": idata.log_likelihood.obs.values,
        "sample_stats/_flat_draws": idata.sample_stats._flat_draws.values,
        "observed_data/y": model.data["y"],
        "observed_data/sigma": model.data["sigma"],
    }
    path = os.path.join(DATA_DIR, f"{name}.npz")
    np.savez_compressed(path, **out)
    print(
        name,
        "accept=%.2f" % float(idata.sample_stats.accept_rate.values.mean()),
        "ess(mu)=%.0f" % float(ess_mean(idata.posterior.mu.values)),
        "ess(tau)=%.0f" % float(ess_mean(idata.posterior.tau.values)),
        "->",
        path,
    )


if __name__ == "__main__":
    dump(
        "centered_eight",
        eight_schools_centered(),
        seed=2024,
        num_leapfrog=64,
        target_accept=0.95,
    )
    dump(
        "non_centered_eight",
        eight_schools_noncentered(),
        seed=2025,
        num_leapfrog=48,
        target_accept=0.9,
    )
