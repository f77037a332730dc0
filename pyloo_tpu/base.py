"""Unified importance-sampling dispatch over batched device kernels.

Capability-equivalent to reference ``pyloo/base.py:18-175`` — the
``ISMethod`` enum and ``compute_importance_weights`` — but instead of looping
a 1-D kernel over observations it flattens all observation dims into one
batch axis and makes a single sharded device call
(:func:`pyloo_tpu.parallel.apply_rowwise`).
"""

from __future__ import annotations

import functools
from enum import Enum
from typing import Union

import numpy as np

from .containers import DataArray
from .ops import psislw_batch, sislw_batch, tislw_batch, tail_length
from .parallel import apply_rowwise
from .rcparams import rcParams

__all__ = ["ISMethod", "compute_importance_weights"]


# On an accelerator, the obs-major swap of a lazily-stacked payload runs on
# device (the host ships the original contiguous buffer; XLA transposes at HBM
# bandwidth).  On the CPU backend the "device" is the same host core, so the
# swap is just a slower copy — keep numpy's.  Tests force the device path.
_FORCE_DEVICE_INGEST = False


def _device_ingest_enabled() -> bool:
    if _FORCE_DEVICE_INGEST:
        return True
    import jax

    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=64)
def _obs_major_program(shape, order, n_collapse, dtype_name):
    """Compiled device program: transpose to obs-major, flatten, cast.

    One tiny XLA program per (shape, permutation, dtype) — the swap runs at
    HBM bandwidth instead of as a single-threaded strided host copy.
    """
    import jax
    import jax.numpy as jnp

    n_lead = len(shape) - n_collapse

    def prep(x):
        v = jnp.transpose(x, order)
        lead = 1
        for s in v.shape[:n_lead]:
            lead *= s
        return v.reshape(max(lead, 1), -1).astype(dtype_name)

    return jax.jit(prep)


def _obs_major_device_matrix(base, order, n_collapse, dtype):
    """Ship the contiguous pre-stack payload and swap to (N, S) on device."""
    import jax

    dev = jax.device_put(base)
    fn = _obs_major_program(
        base.shape, tuple(order), int(n_collapse), np.dtype(dtype).name
    )
    return fn(dev)


class ISMethod(str, Enum):
    """Supported importance sampling methods."""

    PSIS = "psis"
    SIS = "sis"
    TIS = "tis"


def _compute_dtype():
    return np.float64 if rcParams["device.precision"] == "float64" else np.float32


def as_sample_matrix(log_weights):
    """Normalize input to a (n_obs_flat, S) float matrix plus rebuild info.

    Accepts a :class:`DataArray` (``__sample__`` dim anywhere, or unstacked
    ``chain``/``draw`` dims) or a bare ndarray whose *last* axis is samples.
    Returns ``(matrix, rebuild)`` where ``rebuild(lw2d, diag1d)`` restores the
    caller-facing container types and shapes.
    """
    dtype = _compute_dtype()

    if isinstance(log_weights, DataArray):
        da = log_weights
        if "__sample__" not in da.dims:
            if "chain" in da.dims and "draw" in da.dims:
                da = da.stack(__sample__=("chain", "draw"))
            else:
                raise ValueError("log_weights must have a __sample__ dimension")
        obs_dims = tuple(d for d in da.dims if d != "__sample__")
        target = obs_dims + ("__sample__",)
        obs_shape = tuple(da.sizes[d] for d in obs_dims)
        S = da.sizes["__sample__"]
        coords = {d: c for d, c in da.coords.items() if d in obs_dims}
        sample_coord = da.coords.get("__sample__")

        lazy = da._lazy
        if (
            lazy is not None
            and da.dims == target
            and lazy[0].flags.c_contiguous
            and _device_ingest_enabled()
        ):
            # deferred stack: the transpose-copy never happens on host — the
            # original contiguous payload ships as-is and XLA performs the
            # obs-major swap + cast on device at HBM bandwidth
            matrix = _obs_major_device_matrix(lazy[0], lazy[1], lazy[2], dtype)
        else:
            if da.dims != target:
                da = da.transpose(*target)
            matrix = np.ascontiguousarray(
                da.values.reshape(-1, S) if obs_dims else da.values.reshape(1, S)
            ).astype(dtype, copy=False)

        def rebuild(lw2d, diag1d):
            lw = np.asarray(lw2d).reshape(obs_shape + (S,))
            diag = np.asarray(diag1d).reshape(obs_shape)
            lw_coords = dict(coords)
            if sample_coord is not None:
                lw_coords["__sample__"] = sample_coord
            lw_da = DataArray(lw, obs_dims + ("__sample__",), lw_coords, "log_weights")
            diag_da = DataArray(diag, obs_dims, dict(coords))
            return lw_da, diag_da

        return matrix, S, rebuild

    arr = np.asarray(log_weights)
    if arr.ndim == 0:
        raise ValueError("log_weights must have at least one dimension")
    obs_shape = arr.shape[:-1]
    S = arr.shape[-1]
    matrix = np.ascontiguousarray(arr.reshape(-1, S)).astype(dtype, copy=False)

    def rebuild(lw2d, diag1d):
        lw = np.asarray(lw2d).reshape(obs_shape + (S,))
        diag = np.asarray(diag1d).reshape(obs_shape)
        if diag.ndim == 0:
            diag = diag[()]
        return lw, diag

    return matrix, S, rebuild


def compute_importance_weights(
    log_weights: Union[DataArray, np.ndarray, None] = None,
    method: Union[ISMethod, str] = ISMethod.PSIS,
    reff: float = 1.0,
):
    """Compute smoothed/truncated/normalized log importance weights.

    Parameters
    ----------
    log_weights : DataArray or (..., S) array-like
        Raw log weights; for LOO this is ``-log_likelihood``.
    method : {'psis', 'sis', 'tis'}
    reff : float
        Relative MCMC efficiency (PSIS tail sizing only).

    Returns
    -------
    lw_out
        Processed log weights, same container type/shape as the input.
    diagnostic
        Pareto k (PSIS) or effective sample size (SIS/TIS) per observation.
    """
    if isinstance(method, str):
        try:
            method = ISMethod(method.lower())
        except ValueError:
            valid_methods = ", ".join(m.value for m in ISMethod)
            raise ValueError(
                f"Invalid method '{method}'. Must be one of: {valid_methods}"
            )

    if log_weights is None:
        raise ValueError("log_weights must be provided")

    matrix, n_samples, rebuild = as_sample_matrix(log_weights)
    if n_samples < 2:
        raise ValueError(
            "importance sampling requires at least 2 draws per observation,"
            f" got {n_samples}"
        )

    if method == ISMethod.PSIS:
        m_tail = tail_length(n_samples, reff)
        lw, diag = apply_rowwise(
            lambda block: psislw_batch(block, m_tail), matrix, n_outputs=2
        )
        diag_name = "pareto_shape"
    elif method == ISMethod.SIS:
        lw, diag = apply_rowwise(sislw_batch, matrix, n_outputs=2)
        diag_name = "ess"
    else:
        lw, diag = apply_rowwise(tislw_batch, matrix, n_outputs=2)
        diag_name = "ess"

    lw_out, diag_out = rebuild(lw, diag)
    if isinstance(diag_out, DataArray):
        diag_out = diag_out.rename(diag_name)
    return lw_out, diag_out
