"""Streaming PSIS-LOO for datasets too large to materialize.

The reference workflow (reference ``pyloo/loo.py:41-127``) requires the full
``(n_obs, n_draws)`` log-likelihood in memory — 320 GB at 1e7 x 4000 — which
caps it well below production scale.  On TPU the natural design is the
opposite: the *model* lives on device, and the log-likelihood is a pure
function of the observation index, evaluated chunk by chunk through one
jitted per-chunk step (a host loop of async dispatches chained by a
device-resident carry) that fuses evaluation with the PSIS-LOO score kernel
and keeps only O(chunk) live memory.  Nothing crosses the host boundary until
the final scalars (or the optional ``(n_obs,)`` pointwise arrays).

``loo_streaming(log_lik_fn, ...)`` therefore accepts a *traceable* callback::

    def log_lik_fn(obs_idx):          # (chunk,) int32 observation indices
        return ...                    # (chunk, n_draws) log-likelihood

closing over device-resident posterior draws / covariates, and returns the
same :class:`~pyloo_tpu.elpd.ELPDData` as :func:`pyloo_tpu.loo`.
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ._common import good_k_threshold, resolve_scale
from .base import ISMethod
from .containers import DataArray
from .elpd import ELPDData
from .ops import tail_length
from .ops.loo_kernels import (
    loo_scores_psis,
    loo_scores_psis_fast,
    loo_scores_sis,
    loo_scores_tis,
)
from .rcparams import rcParams

__all__ = ["loo_streaming"]


def _kernel_for(method, tail_max, dtype):
    if method == ISMethod.PSIS:
        if dtype == jnp.float32:
            return partial(loo_scores_psis_fast, tail_max=tail_max)
        return partial(loo_scores_psis, tail_max=tail_max)
    if method == ISMethod.SIS:
        return loo_scores_sis
    return loo_scores_tis


# Module-level jitted per-chunk step: scoring + running-sum accumulation.
# Deliberately NOT a closure inside loo_streaming — the jit cache keys on
# (shapes, dtypes, statics), so every loo_streaming call with the same chunk
# geometry reuses one compiled program instead of re-tracing and re-compiling
# the (expensive) score kernel per call.  Only the user's log_lik_fn is
# compiled per call.
@partial(jax.jit, static_argnames=("method", "tail_max"))
def _accumulate_chunk(ll, c, n_obs, carry, *, method, tail_max):
    chunk = ll.shape[0]
    idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
    valid = idx < n_obs
    elpd_i, diag, lppd_i = _kernel_for(method, tail_max, ll.dtype)(ll)

    # accumulate in the widest available dtype: float32 running sums lose
    # ~7 digits over 1e7 observations (the per-chunk cast fuses into the sum)
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    elpd_m = jnp.where(valid, elpd_i, 0.0).astype(acc)
    carry = dict(
        carry,
        sum_e=carry["sum_e"] + jnp.sum(elpd_m),
        sum_e2=carry["sum_e2"] + jnp.sum(elpd_m * elpd_m),
        sum_lppd=carry["sum_lppd"]
        + jnp.sum(jnp.where(valid, lppd_i, 0.0).astype(acc)),
    )
    if method == ISMethod.PSIS:
        k = jnp.where(valid, diag, -jnp.inf)
        carry["n_bad"] = carry["n_bad"] + jnp.sum(
            k > carry["good_k"], dtype=jnp.int32
        )
        carry["k_max"] = jnp.maximum(carry["k_max"], jnp.max(k))
    else:
        carry["diag_min"] = jnp.minimum(
            carry["diag_min"], jnp.min(jnp.where(valid, diag, jnp.inf))
        )
    return carry, elpd_i, diag


@jax.jit
def _write_chunk(buf, vals, start):
    return jax.lax.dynamic_update_slice(buf, vals, (start,))


def loo_streaming(
    log_lik_fn,
    n_obs: int,
    n_draws: int,
    *,
    reff: float = 1.0,
    chunk_size: int | None = None,
    pointwise: bool = False,
    method: str | ISMethod = "psis",
    scale: str | None = None,
    dtype=None,
    mesh=None,
):
    """LOO-CV over ``n_obs`` observations whose log-likelihood is computed
    on device by ``log_lik_fn`` — no (n_obs, n_draws) matrix is ever built.

    Parameters
    ----------
    log_lik_fn : callable
        Traceable function mapping a ``(chunk,)`` int32 array of observation
        indices to the ``(chunk, n_draws)`` log-likelihood of those
        observations.  It runs under ``jit``; close over device arrays, not
        Python state.
    n_obs, n_draws : int
        Dataset extent.  ``n_draws`` must be at least 2.
    reff : float
        Relative MCMC efficiency (reference ``pyloo/loo.py:115``).
    chunk_size : int, optional
        Rows per loop step.  Default sizes the chunk at ~2 GB of
        log-likelihood, rounded to a multiple of 8 (and of the mesh size
        when ``mesh`` is given).
    pointwise : bool
        Also return per-observation ``loo_i`` / diagnostics (adds an
        ``(n_obs,)`` device buffer and one host fetch).
    method : {"psis", "sis", "tis"}
        Importance sampling method (reference ``pyloo/loo.py:96``).
    scale : {"log", "negative_log", "deviance"}, optional
    dtype : optional
        Computation dtype; defaults to ``rcParams["device.precision"]``.
        float32 uses the compact fast PSIS kernel, float64 the exact one.
    mesh : jax.sharding.Mesh, optional
        Mesh with an ``"obs"`` axis; each chunk's rows are sharded across it.

    Returns
    -------
    ELPDData with the same rows as :func:`pyloo_tpu.loo`.
    """
    method = ISMethod(method.lower() if isinstance(method, str) else method)
    scale, scale_value = resolve_scale(scale)
    if n_draws < 2:
        raise ValueError("PSIS requires at least 2 draws per observation.")
    if n_obs < 1:
        raise ValueError("n_obs must be positive.")

    if dtype is None:
        dtype = jnp.dtype(rcParams["device.precision"])
    else:
        dtype = jnp.dtype(dtype)

    if chunk_size is None:
        chunk_size = max((2 << 30) // (n_draws * dtype.itemsize), 8)
    chunk_size = int(min(chunk_size, n_obs))
    multiple = 8 if mesh is None else int(np.lcm(8, mesh.devices.size))
    chunk_size = max(multiple, chunk_size - chunk_size % multiple)
    n_chunks = -(-n_obs // chunk_size)

    tail_max = tail_length(n_draws, reff)

    # only the (cheap, user-model) generation step compiles per call; the
    # score/accumulate step is the module-level cached _accumulate_chunk
    gen_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        gen_kwargs["out_shardings"] = NamedSharding(mesh, P("obs", None))

    @partial(jax.jit, **gen_kwargs)
    def gen(c):
        start = c * chunk_size
        idx = start + jnp.arange(chunk_size, dtype=jnp.int32)
        return log_lik_fn(jnp.minimum(idx, n_obs - 1)).astype(dtype)

    good_k = good_k_threshold(n_draws)
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    zero = jnp.zeros((), acc)
    init = {"sum_e": zero, "sum_e2": zero, "sum_lppd": zero}
    if method == ISMethod.PSIS:
        init["good_k"] = jnp.asarray(good_k, dtype)
        init["n_bad"] = jnp.zeros((), jnp.int32)
        init["k_max"] = jnp.asarray(-jnp.inf, dtype)
    else:
        init["diag_min"] = jnp.asarray(jnp.inf, dtype)

    # A host loop of *async* dispatches chained by the device-resident carry;
    # nothing is fetched until the end, so dispatch overhead pipelines under
    # the chunk compute.  No buffer donation: donating the carry across
    # sharded steps deadlocked the CPU-mesh collectives (an all_gather
    # rendezvous lost a participant), and the per-step copies it would save
    # are tiny next to the chunk work.
    carry = init
    n_obs_dev = jnp.asarray(n_obs, jnp.int32)
    buf_e = buf_d = None
    if pointwise:
        buf_e = jnp.zeros((n_chunks * chunk_size,), dtype)
        buf_d = jnp.zeros((n_chunks * chunk_size,), dtype)
    for c in range(n_chunks):
        ci = jnp.asarray(c, jnp.int32)
        ll = gen(ci)
        carry, elpd_i, diag = _accumulate_chunk(
            ll, ci, n_obs_dev, carry, method=method, tail_max=tail_max
        )
        if pointwise:
            start = jnp.asarray(c * chunk_size, jnp.int32)
            buf_e = _write_chunk(buf_e, elpd_i, start)
            buf_d = _write_chunk(buf_d, diag.astype(dtype), start)
    out = jax.device_get(carry)
    elpd_i_host = diag_host = None
    if pointwise:
        elpd_i_host = np.asarray(jax.device_get(buf_e))[:n_obs]
        diag_host = np.asarray(jax.device_get(buf_d))[:n_obs]

    sum_e = float(out["sum_e"])
    sum_e2 = float(out["sum_e2"])
    lppd = float(out["sum_lppd"])
    var_e = max(sum_e2 / n_obs - (sum_e / n_obs) ** 2, 0.0)

    warn_mg = False
    if method == ISMethod.PSIS:
        if int(out["n_bad"]) > 0:
            warnings.warn(
                "Estimated shape parameter of Pareto distribution is greater"
                f" than {good_k:.2f} for {int(out['n_bad'])} observations."
                " This indicates that importance sampling may be unreliable"
                " because the marginal posterior and LOO posterior are very"
                " different.",
                UserWarning,
                stacklevel=2,
            )
            warn_mg = True
    else:
        min_ess = float(out["diag_min"])
        if min_ess < n_draws * 0.1:
            warnings.warn(
                f"Low effective sample size detected (minimum ESS:"
                f" {min_ess:.1f}). This indicates that the importance sampling"
                " approximation may be unreliable. Consider using PSIS which"
                " is more robust to such cases.",
                UserWarning,
                stacklevel=2,
            )
            warn_mg = True

    loo_lppd = scale_value * sum_e
    loo_lppd_se = abs(scale_value) * float((n_obs * var_e) ** 0.5)
    p_loo = lppd - loo_lppd / scale_value
    # matches loo(): sqrt of the population variance of the *scaled* loo_i
    p_loo_se = abs(scale_value) * float(np.sqrt(var_e))
    looic = -2 * loo_lppd
    looic_se = 2 * loo_lppd_se

    from .loo import _assemble

    loo_lppd_i = diagnostic = None
    if pointwise:
        loo_lppd_i = DataArray(
            scale_value * elpd_i_host, ("obs",), name="loo_i"
        )
        diagnostic = DataArray(
            diag_host,
            ("obs",),
            name="pareto_k" if method == ISMethod.PSIS else "ess",
        )

    return _assemble(
        False, loo_lppd, loo_lppd_se, p_loo, p_loo_se, n_draws, n_obs,
        warn_mg, scale, looic, looic_se,
        loo_lppd_i=loo_lppd_i, diagnostic=diagnostic,
        method=method, good_k=good_k if method == ISMethod.PSIS else None,
    )
