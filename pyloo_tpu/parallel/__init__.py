"""Device-mesh parallelism for the observation axis.

The reference is single-process NumPy (SURVEY.md §2.7: no parallelism of any
kind).  Here the observation axis of every ``(n_obs, S)`` tensor shards across
a ``jax.sharding.Mesh``; all cross-observation reductions (elpd sums,
variances, k-histograms) lower to XLA collectives over ICI.
"""

from .sharding import apply_rowwise, obs_mesh, obs_sharding, replicated_sharding

__all__ = ["apply_rowwise", "obs_mesh", "obs_sharding", "replicated_sharding"]
