"""Batched device kernels (JAX/XLA) — the numerical core of pyloo_tpu.

Every kernel operates on the central ``(n_obs, n_samples)`` log-likelihood /
log-weight tensor, is fully vectorized over the observation axis (replacing
the reference's per-observation ``np.ndindex`` Python loop,
``pyloo/utils.py:137-175``), jit-compiled, and shardable over a device mesh.
"""

from .lse import logsumexp
from .psis import (
    compact_weighted_mean,
    compact_weighted_moments,
    gpdfit,
    gpinv,
    psislw_batch,
    psislw_compact_batch,
    sislw_batch,
    tislw_batch,
    tail_length,
)
from .ess import ess_mean, relative_eff

__all__ = [
    "logsumexp",
    "psislw_batch",
    "psislw_compact_batch",
    "compact_weighted_mean",
    "compact_weighted_moments",
    "sislw_batch",
    "tislw_batch",
    "gpdfit",
    "gpinv",
    "tail_length",
    "ess_mean",
    "relative_eff",
]
