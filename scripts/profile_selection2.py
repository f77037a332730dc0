"""Round 2: segmented two-stage top-k (values-only, exact).

Global top-K of a row is a subset of the union of per-segment top-Ks, so
  stage 1: top-K within each of G segments of width S/G
  stage 2: top-K of the concatenated (G*K) per-segment winners
is exact. Bitonic top-k cost grows with the sorted width, so shrinking the
width from 4000 to G*K should beat the single-stage sort.

Usage: python scripts/profile_selection2.py [G ...]   (default: 4 8)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, K = 125_000, 4000, 191
REPS = 2


def timed(name, fn, args_list):
    out = fn(*args_list[0])
    float(jnp.ravel(out)[0])
    times = []
    for args in args_list[1 : REPS + 1]:
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(times)*1e3:9.1f} ms   probe={s:.3f}", flush=True)
    return min(times)


def two_stage(G):
    seg = S // G

    @jax.jit
    def fn(x):
        xs = x.reshape(B, G, seg)
        v1, _ = jax.lax.approx_max_k(xs, min(K, seg), recall_target=1.0)
        v2, _ = jax.lax.approx_max_k(v1.reshape(B, -1), K, recall_target=1.0)
        return v2

    return fn


def main():
    groups = [int(a) for a in sys.argv[1:]] or [4, 8]
    rng = np.random.default_rng(0)
    base = rng.normal(-1.0, 0.5, size=(B, S)).astype(np.float32)
    args_list = [
        (jax.device_put(base + np.float32(0.001 * i)),) for i in range(REPS + 1)
    ]

    @jax.jit
    def baseline(x):
        v, _ = jax.lax.approx_max_k(x, K, recall_target=1.0)
        return v

    v_ref = None
    for G in groups:
        fn = two_stage(G)
        timed(f"two-stage G={G} (seg={S//G}, mid={G*min(K, S//G)})", fn, args_list)
        if v_ref is None:
            v_ref = baseline(args_list[0][0])
        ok = bool(jnp.all(fn(args_list[0][0]) == v_ref))
        print(f"  exact match vs single-stage: {ok}", flush=True)


if __name__ == "__main__":
    main()
