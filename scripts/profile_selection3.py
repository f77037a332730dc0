"""Round 3: pick the best exact segmented top-k cascade.

One resident (B, S) array; reps are salted ON DEVICE (a fused elementwise
add, ~2 ms) so the tunnel's result cache is defeated without re-uploading
2 GB per repetition.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, K = 125_000, 4000, 191
REPS = 3


def timed(name, fn, x):
    salted = jax.jit(lambda x, s: x + s)
    out = fn(salted(x, jnp.float32(0.5)))
    float(jnp.ravel(out)[0])
    times = []
    for i in range(REPS):
        xi = salted(x, jnp.float32(0.001 * (i + 1)))
        jax.block_until_ready(xi)
        float(jnp.ravel(xi)[0])  # force materialization before timing
        t0 = time.perf_counter()
        out = fn(xi)
        s = float(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(times)*1e3:9.1f} ms   probe={s:.3f}", flush=True)
    return min(times)


def cascade(*widths):
    """Exact top-K via successive segmented approx_max_k passes.

    widths are the segment widths per stage; the final stage always
    aggregates to (B, K).
    """

    def fn(x):
        y = x
        for w in widths:
            b, s = y.shape
            g = s // w
            if g <= 1:
                break
            ys = y.reshape(b, g, w)
            v, _ = jax.lax.approx_max_k(ys, min(K, w), recall_target=1.0)
            y = v.reshape(b, -1)
        v, _ = jax.lax.approx_max_k(y, K, recall_target=1.0)
        return v

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    base = rng.normal(-1.0, 0.5, size=(B, S)).astype(np.float32)
    x = jax.device_put(base)
    jax.block_until_ready(x)
    print("uploaded", flush=True)

    single = cascade()
    t0 = timed("single-stage (current)", single, x)
    v_ref = single(x)

    candidates = {
        "G=2  (2000 -> 382)": cascade(2000),
        "G=4  (1000 -> 764)": cascade(1000),
        "G=8  (500 -> 1528)": cascade(500),
        "3-stage (500 -> 382-seg -> 764)": cascade(500, 382),
        "3-stage (1000 -> 382-seg -> 764)": cascade(1000, 382),
    }
    for name, fn in candidates.items():
        timed(name, fn, x)
        ok = bool(jnp.all(fn(x) == v_ref))
        print(f"  exact: {ok}", flush=True)


if __name__ == "__main__":
    main()
