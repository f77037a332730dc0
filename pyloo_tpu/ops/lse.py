"""Device logsumexp primitives."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["logsumexp"]


def logsumexp(x, axis=-1, b_inv=None, keepdims=False):
    """Max-shifted ``log(sum(exp(x)))`` along ``axis`` on device.

    ``b_inv`` scales the sum by ``1/b_inv`` (used for ``lppd`` where the
    average over S draws is taken in log space, reference ``pyloo/loo.py:329``).
    """
    xmax = jnp.max(x, axis=axis, keepdims=True)
    # guard fully -inf rows: exp(-inf - -inf) would be nan
    xmax = jnp.where(jnp.isfinite(xmax), xmax, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(x - xmax), axis=axis, keepdims=True)) + xmax
    if b_inv is not None:
        out = out - jnp.log(jnp.asarray(b_inv, dtype=out.dtype))
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out
