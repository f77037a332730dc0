"""Shared test helpers (reference ``pyloo/tests/helpers.py:12-23``)."""

import warnings
from contextlib import contextmanager


@contextmanager
def does_not_warn(warning=Warning):
    """Assert that the body raises no warning of the given category."""
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        yield
        for w in caught:
            if issubclass(w.category, warning):
                raise AssertionError(
                    f"Expected no {warning.__name__} but caught warning with"
                    f" message: {w.message}"
                )
