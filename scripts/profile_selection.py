"""Profile top-k selection strategies on the current backend (ad hoc).

Times the production paths against each other and against the one-pass HBM
floor, at a configurable shape:

* ``sum`` / ``max`` — single streaming pass over the row; the bandwidth
  floor any selection strategy is judged against;
* ``cascade`` — :func:`pyloo_tpu.ops.selection.topk_vals_desc`, the exact
  segmented ``approx_max_k`` cascade (the portable path);
* ``lax.top_k`` — XLA's exact single-stage top-k;
* ``pallas`` — :func:`pyloo_tpu.ops.pallas_topk.pallas_topk_desc` when
  ``supports(S, K)`` (TPU only);
* ``prepass`` / ``prepass-multi`` — the fused LOO prepass (top-k + row max
  + non-tail mass + lppd logsumexp in one HBM pass), single-pass or
  draw-split multipass per :func:`multipass_parts`.

Axon-tunnel methodology (see bench.py): repetitions are salted on device so
the server's result cache is defeated, and a dependent scalar fetch is the
synchronization point.

Usage: python scripts/profile_selection.py [B S K]   (default 125000 4000 191)

History: rounds 1-3 used three throwaway scripts (profile_selection{,2,3})
to race candidate designs — full sort vs approx_max_k variants vs threshold
bisection vs segmented cascades; the measured outcomes are recorded in the
docstrings of ops/selection.py and ops/pallas_topk.py. This script replaces
them with a maintained profiler of the strategies that won.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

REPS = 3


def timed(name, fn, x):
    salt = jax.jit(lambda x, s: x + s)
    try:
        out = fn(salt(x, jnp.float32(0.5)))  # compile + warm
        float(jnp.ravel(out)[0])
        times = []
        for i in range(REPS):
            xi = salt(x, jnp.float32(1e-3 * (i + 1)))
            float(xi[0, 0])  # salt pass outside the timed region
            t0 = time.perf_counter()
            out = fn(xi)
            probe = float(jnp.ravel(out)[0])  # dependent fetch = sync
            times.append(time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — report and keep profiling
        print(f"{name:34s} FAILED: {type(e).__name__}: {e}")
        return
    best = min(times)
    b = x.shape[0]
    print(
        f"{name:34s} {best * 1e3:9.1f} ms  {b / best / 1e6:7.2f} Mrows/s"
        f"   (all: {[f'{t * 1e3:.0f}' for t in times]})  probe={probe:.3f}"
    )


def main():
    b, s, k = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
        125_000, 4000, 191,
    )
    print(f"devices: {jax.devices()}   shape=({b}, {s})  k={k}")

    from pyloo_tpu.ops.pallas_topk import (
        multipass_parts,
        pallas_loo_prepass,
        pallas_loo_prepass_multi,
        pallas_topk_desc,
        supports,
    )
    from pyloo_tpu.ops.selection import fast_path_route, topk_vals_desc

    print(f"fast_path_route: {fast_path_route(b, s, k, jnp.float32)}")

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(-1.0, 0.5, size=(b, s)).astype(np.float32))
    float(x[0, 0])

    timed("sum (1-pass HBM floor)", jax.jit(lambda x: jnp.sum(x, axis=1)), x)
    timed("max (1-pass HBM floor)", jax.jit(lambda x: jnp.max(x, axis=1)), x)
    timed(
        "cascade (topk_vals_desc)",
        jax.jit(lambda x: topk_vals_desc(x, k)),
        x,
    )
    timed(
        "lax.top_k exact",
        jax.jit(lambda x: jax.lax.top_k(x, k)[0]),
        x,
    )
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and supports(s, k):
        timed("pallas bitonic top-k", lambda x: pallas_topk_desc(x, k), x)
        timed("pallas fused prepass", lambda x: pallas_loo_prepass(x, k)[0], x)
    parts = multipass_parts(s, k)
    if on_tpu and parts and parts > 1:
        timed(
            f"pallas multipass prepass (parts={parts})",
            lambda x: pallas_loo_prepass_multi(x, k, parts=parts)[0],
            x,
        )


if __name__ == "__main__":
    main()
