"""Component profile of the Pallas top-k path at the bench shape.

Separates the XLA pre/post transpose cost from the kernel itself so the
optimization target is unambiguous.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

B, S, K = 125_000, 4000, 191
N_ITERS = 8


def timeit(name, fn, *args):
    r = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(r)
    _ = float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(N_ITERS):
        r = fn(*args, jnp.float32(i) * jnp.float32(1e-6))
        acc += float(jnp.asarray(r).ravel()[0])
    wall = time.perf_counter() - t0
    print(f"{name}: {wall / N_ITERS * 1e3:.1f} ms/chunk", flush=True)


def main():
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pyloo_tpu.ops import pallas_topk as ptk

    base = 1.5 * jax.random.normal(jax.random.PRNGKey(0), (B, S), jnp.float32)
    _ = float(base[0, 0])

    n_segs, rows, blk = 16, 8, 4
    rows_per_step = rows * blk
    b_pad = -(-B // rows_per_step) * rows_per_step
    grid = b_pad // rows_per_step

    @jax.jit
    def transpose_only(x, salt):
        xp = jnp.pad(
            x + salt, ((0, b_pad - B), (0, 96)), constant_values=-jnp.inf
        )
        xt = (
            xp.reshape(grid, blk, rows, n_segs, 256)
            .transpose(0, 1, 4, 3, 2)
            .reshape(grid * blk, 256, 128)
        )
        return jnp.sum(xt[:, 0, :])

    @jax.jit
    def full_path(x, salt):
        return jnp.sum(ptk.pallas_topk_desc(x + salt, K))

    # pre-transposed kernel-only path
    xt0 = jnp.pad(base, ((0, b_pad - B), (0, 96)), constant_values=-jnp.inf)
    xt0 = (
        xt0.reshape(grid, blk, rows, n_segs, 256)
        .transpose(0, 1, 4, 3, 2)
        .reshape(grid * blk, 256, 128)
    )
    xt0 = jax.device_put(xt0)
    _ = float(xt0[0, 0, 0])

    @jax.jit
    def kernel_only(xt, salt):
        out = pl.pallas_call(
            partial(ptk._kernel_roll, n_segs, rows, blk),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (blk, 256, 128),
                    lambda j: (j, 0 * j, 0 * j),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (blk, 256, rows),
                lambda j: (j, 0 * j, 0 * j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((grid * blk, 256, rows), jnp.float32),
        )(xt + salt)
        return jnp.sum(out[:, :K // rows, :])

    timeit("transpose_only(+pad+salt+sum)", transpose_only, base)
    timeit("kernel_only(+salt+sum)", kernel_only, xt0)
    timeit("full_path", full_path, base)


if __name__ == "__main__":
    main()
