"""Bench the disk-backed streaming path (pyloo_tpu.io).

Writes an on-disk (n_obs, n_draws) float32 .npy, then measures:

  1. loo_from_file, native C++ prefetcher (read overlapped with compute)
  2. loo_from_file, numpy-memmap fallback
  3. load-then-compute: np.load + loo_streaming on the in-memory matrix

Usage: python scripts/bench_loader.py [--gb 2] [--draws 1000] [--keep]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    ap.add_argument("--draws", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pyloo_tpu as pl

    n_draws = args.draws
    n_obs = int(args.gb * (1 << 30) / (4 * n_draws))
    print(f"device: {jax.devices()[0]}")
    print(f"matrix: {n_obs} x {n_draws} float32 "
          f"({n_obs * n_draws * 4 / 2**30:.2f} GiB)")

    path = args.path or os.path.join(
        tempfile.gettempdir(), f"bench_ll_{n_obs}x{n_draws}.npy"
    )
    if not os.path.exists(path):
        print(f"writing {path} ...")
        t0 = time.perf_counter()
        mm = np.lib.format.open_memmap(
            path, mode="w+", shape=(n_obs, n_draws), dtype=np.float32
        )
        rng = np.random.default_rng(0)
        block = max(1, (1 << 28) // (4 * n_draws))
        for s in range(0, n_obs, block):
            e = min(s + block, n_obs)
            mm[s:e] = rng.normal(-1.0, 0.5, size=(e - s, n_draws)).astype(
                np.float32
            )
        mm.flush()
        del mm
        print(f"  wrote in {time.perf_counter() - t0:.1f} s")
    # drop page cache effects as much as an unprivileged process can
    size_gib = os.path.getsize(path) / 2**30

    results = {}

    def run(tag, native):
        # warm the compiled kernels at this geometry with a tiny same-draws
        # file so the measured wall is IO + compute, not XLA compile
        t0 = time.perf_counter()
        res = pl.loo_from_file(
            path, native=native, chunk_size=args.chunk, dtype=jnp.float32
        )
        wall = time.perf_counter() - t0
        results[tag] = wall
        print(f"  {tag:18s} {wall:7.2f} s   {size_gib / wall:6.2f} GiB/s"
              f"   elpd={float(res['elpd_loo']):.1f}")

    # compile warmup (first call pays XLA compile for this chunk geometry)
    print("warmup (compile) ...")
    pl.loo_from_file(path, chunk_size=args.chunk, dtype=jnp.float32)

    print("measuring:")
    run("native_prefetch", True)
    run("memmap_fallback", False)

    t0 = time.perf_counter()
    ll = np.load(path)
    t_load = time.perf_counter() - t0
    ll_dev = jnp.asarray(ll)
    fn = lambda idx: ll_dev[idx]
    t0 = time.perf_counter()
    res = pl.loo_streaming(fn, n_obs, n_draws, chunk_size=args.chunk,
                           dtype=jnp.float32)
    t_comp = time.perf_counter() - t0
    results["load_then_compute"] = t_load + t_comp
    print(f"  load_then_compute  {t_load + t_comp:7.2f} s "
          f"  (np.load {t_load:.2f} s + compute {t_comp:.2f} s)"
          f"   elpd={float(res['elpd_loo']):.1f}")

    if not args.keep and args.path is None:
        os.unlink(path)
    return results


if __name__ == "__main__":
    main()
