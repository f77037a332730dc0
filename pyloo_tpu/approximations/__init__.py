"""Cheap elpd approximations that drive the subsampling estimators.

Capability-equivalent to reference ``pyloo/approximations/*``; each
approximation is a single sharded device pass over the full ``(N, S)``
log-likelihood tensor.
"""

from .base import LooApproximation, thin_draws
from .importance_sampling import (
    ImportanceSamplingApproximation,
    SISApproximation,
    TISApproximation,
)
from .lpd import LPDApproximation
from .plpd import PLPDApproximation

__all__ = [
    "LooApproximation",
    "thin_draws",
    "PLPDApproximation",
    "LPDApproximation",
    "TISApproximation",
    "SISApproximation",
    "ImportanceSamplingApproximation",
]
