"""Approximation interface and draw thinning."""

from __future__ import annotations

from typing import Optional, Protocol

import numpy as np

from ..containers import DataArray, Dataset

__all__ = ["LooApproximation", "thin_draws"]


class LooApproximation(Protocol):
    """Anything that maps a stacked log-likelihood to per-obs elpd guesses."""

    def compute_approximation(
        self, log_likelihood: DataArray, n_draws: Optional[int] = None
    ) -> np.ndarray: ...


def thin_draws(data, n_draws: Optional[int] = None):
    """Evenly-spaced thinning of the sample dimension to ``n_draws``.

    Accepts a :class:`DataArray` (with ``__sample__`` or chain/draw dims) or a
    :class:`Dataset`; mirrors reference ``approximations/base.py:37-107``.
    """
    if n_draws is None:
        return data

    if isinstance(data, Dataset):
        return Dataset(
            {k: thin_draws(v, n_draws) for k, v in data.data_vars.items()},
            data.attrs,
        )

    da = data
    if "__sample__" not in da.dims:
        if "chain" in da.dims and "draw" in da.dims:
            da = da.stack(__sample__=("chain", "draw"))
        else:
            raise ValueError("No sample dimension found in DataArray")
    n_samples = da.sizes["__sample__"]
    if n_draws > n_samples:
        raise ValueError(
            f"Target number of draws ({n_draws}) cannot exceed "
            f"current number of draws ({n_samples})"
        )
    idx = np.linspace(0, n_samples - 1, n_draws, dtype=int)
    return da.isel(__sample__=idx)
