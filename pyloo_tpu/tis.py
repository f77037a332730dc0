"""Truncated importance sampling — public API (reference ``pyloo/tis.py``).

Truncation at ``log(Z-bar) + 0.5 log(S)`` per Ionides (2008), JCGS 17(2).
"""

from __future__ import annotations

from .base import ISMethod, compute_importance_weights

__all__ = ["tislw"]


def tislw(log_weights):
    """Truncated importance sampling: cap, renormalize, and report ESS."""
    lw, ess = compute_importance_weights(log_weights, method=ISMethod.TIS)
    if hasattr(ess, "rename"):
        ess = ess.rename("ess")
    return lw, ess
