"""Drop-in import path: ``from pyloo_tpu.wrapper import PyMCWrapper``.

Mirrors the reference package layout (``pyloo/wrapper/__init__.py``:
exports ``PyMCWrapper`` and ``Laplace``).  The implementations live in
:mod:`pyloo_tpu.models`; this package exists so reference users' imports
resolve unchanged.
"""

from ..models import Laplace, PyMCWrapper

__all__ = ["PyMCWrapper", "Laplace"]
