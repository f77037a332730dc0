"""Laplace approximation of the posterior (MAP + Gaussian curvature).

Capability-equivalent to the reference ``pyloo/wrapper/pymc/laplace.py:56-506``
(which drives pymc-extras' ``fit_laplace``): find the MAP in unconstrained
space, take the Hessian there (``jax.hessian`` — exact, no finite
differences), regularize by escalating diagonal jitter until the negative
Hessian is positive definite, sample the resulting MVN, and expose
``compute_logp`` / ``compute_logq`` for :func:`pyloo_tpu.loo_approximate_posterior`.
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import numpy as np
from scipy import optimize, stats

from ..containers import DataArray, Dataset, InferenceData
from .wrapper import Model

_log = logging.getLogger(__name__)

__all__ = ["Laplace", "LaplaceVIResult"]


@dataclass
class LaplaceVIResult:
    """Laplace fit artifacts: posterior idata, MAP mean, covariance, warnings."""

    idata: InferenceData
    mu: np.ndarray
    H_inv: np.ndarray
    model: Model
    warnings: list = field(default_factory=list)


class Laplace:
    """Laplace (quadratic) approximation for a functional model."""

    def __init__(self, model: Model):
        self.model = model
        self.result: LaplaceVIResult | None = None

    # -- fitting ------------------------------------------------------------
    def fit(
        self,
        draws: int = 1000,
        chains: int = 4,
        seed: int = 0,
        compute_log_likelihood: bool = True,
        optimizer_method: str = "BFGS",
        jitter_start: float = 1e-8,
        jitter_max: float = 1e2,
    ) -> LaplaceVIResult:
        """MAP-fit the model and sample from the Gaussian approximation."""
        model = self.model
        record: list = []

        logp = jax.jit(model.logp_flat)
        grad = jax.jit(jax.grad(model.logp_flat))

        def neg_logp(q):
            return -float(logp(jnp.asarray(q)))

        def neg_grad(q):
            return -np.asarray(grad(jnp.asarray(q)), dtype=np.float64)

        x0 = np.zeros(model.flat_dim)
        opt = optimize.minimize(
            neg_logp, x0, jac=neg_grad, method=optimizer_method
        )
        if not opt.success:
            msg = f"MAP optimization did not fully converge: {opt.message}"
            warnings.warn(msg, UserWarning, stacklevel=2)
            record.append(msg)
        mu = np.asarray(opt.x, dtype=np.float64)

        H = np.asarray(jax.hessian(model.logp_flat)(jnp.asarray(mu)))
        H_neg = -H  # precision of the Gaussian approximation
        H_reg, reg_msg = _regularize_matrix(H_neg, jitter_start, jitter_max)
        if reg_msg:
            record.append(reg_msg)
        H_inv = np.linalg.inv(H_reg)
        H_inv = (H_inv + H_inv.T) / 2

        rng = np.random.default_rng(seed)
        total = draws * chains
        flat_draws = rng.multivariate_normal(
            mu, H_inv, size=total, method="cholesky"
        ).reshape(chains, draws, model.flat_dim)

        idata = self._assemble_idata(flat_draws, compute_log_likelihood)
        self.result = LaplaceVIResult(
            idata=idata, mu=mu, H_inv=H_inv, model=model, warnings=record
        )
        return self.result

    def _assemble_idata(self, flat_draws, compute_log_likelihood):
        model = self.model
        C, T, D = flat_draws.shape
        unravel_v = jax.vmap(jax.vmap(model.unravel))
        upars = unravel_v(jnp.asarray(flat_draws))
        constrained = (
            jax.vmap(jax.vmap(model.constrain))(upars)
            if model.constrain is not None
            else upars
        )
        posterior = {
            name: DataArray(
                np.asarray(values),
                ("chain", "draw")
                + tuple(f"{name}_dim_{i}" for i in range(values.ndim - 2)),
                name=name,
            )
            for name, values in constrained.items()
        }
        groups = {
            "posterior": Dataset(posterior),
            "sample_stats": Dataset(
                {"_flat_draws": DataArray(flat_draws, ("chain", "draw", "flat_param"))}
            ),
            "observed_data": Dataset(
                {
                    k: DataArray(
                        np.asarray(v),
                        tuple(
                            f"{k}_dim_{i}"
                            for i in range(np.asarray(v).ndim)
                        ),
                        name=k,
                    )
                    for k, v in model.data.items()
                    if k in model.obs_keys
                }
            ),
        }
        if compute_log_likelihood:
            ll = jax.jit(jax.vmap(jax.vmap(lambda q: model.log_lik_flat(q))))(
                jnp.asarray(flat_draws)
            )
            groups["log_likelihood"] = Dataset(
                {"obs": DataArray(np.asarray(ll), ("chain", "draw", "obs_id"))}
            )
        return InferenceData(**groups)

    # -- densities ----------------------------------------------------------
    def compute_logp(self, idata: InferenceData | None = None) -> np.ndarray:
        """True (unnormalized) posterior log density at the drawn samples."""
        result = self._require_fit(idata)
        flat = result.idata.sample_stats._flat_draws.values.reshape(
            -1, self.model.flat_dim
        )
        fn = jax.jit(jax.vmap(lambda q: self.model.logp_flat(q)))
        return np.asarray(fn(jnp.asarray(flat)))

    def compute_logq(self, idata: InferenceData | None = None) -> np.ndarray:
        """Gaussian approximation log density at the drawn samples."""
        result = self._require_fit(idata)
        flat = result.idata.sample_stats._flat_draws.values.reshape(
            -1, self.model.flat_dim
        )
        try:
            return stats.multivariate_normal.logpdf(
                flat, mean=result.mu, cov=result.H_inv
            )
        except np.linalg.LinAlgError:
            warnings.warn(
                "Covariance is numerically singular; evaluating logq with"
                " allow_singular=True.",
                UserWarning,
                stacklevel=2,
            )
            return stats.multivariate_normal.logpdf(
                flat, mean=result.mu, cov=result.H_inv, allow_singular=True
            )

    def _require_fit(self, idata):
        if self.result is None:
            raise RuntimeError("Call fit() before computing densities")
        return self.result


def _regularize_matrix(
    matrix: np.ndarray, jitter_start: float, jitter_max: float
):
    """Escalate diagonal jitter until all eigenvalues are positive.

    Mirrors reference ``laplace.py:451-506``.
    """
    eigvals = np.linalg.eigvalsh(matrix)
    if np.all(eigvals > 0):
        return matrix, None
    jitter = jitter_start
    while jitter <= jitter_max:
        candidate = matrix + jitter * np.eye(matrix.shape[0])
        if np.all(np.linalg.eigvalsh(candidate) > 0):
            msg = (
                f"Hessian regularized with diagonal jitter {jitter:.1e} (min"
                f" eigenvalue was {eigvals.min():.2e})"
            )
            warnings.warn(msg, UserWarning, stacklevel=3)
            return candidate, msg
        jitter *= 10
    raise np.linalg.LinAlgError(
        "Could not regularize the negative Hessian to positive definiteness"
        f" (min eigenvalue {eigvals.min():.2e})"
    )
