"""Diagnostic plots (matplotlib backend)."""

from .influence_plot import plot_influence
from .loo_difference_plot import plot_loo_difference
from .loo_plot import plot_loo

# reference-compatible aliases (pyloo/__init__.py exports these names)
loo_plot = plot_loo
influence_plot = plot_influence
loo_difference_plot = plot_loo_difference

__all__ = [
    "plot_loo",
    "plot_influence",
    "plot_loo_difference",
    "loo_plot",
    "influence_plot",
    "loo_difference_plot",
]
