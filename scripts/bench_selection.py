"""Micro-benchmark: exact top-k selection variants at the bench shape.

Candidates for replacing the segmented approx_max_k cascade
(pyloo_tpu/ops/selection.py) on the (125k, 4000) -> top-191 problem that
dominates the fast-path chunk time (~85 ms of ~130 ms).

Methodology (docs/PERFORMANCE.md): salted inputs so the runtime cannot serve
result-cached answers; one device-to-host scalar fetch at the end of the
timed region synchronizes every chunk.

Run:  python scripts/bench_selection.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pyloo_tpu.ops.selection import topk_vals_desc  # noqa: E402

B, S, K = 125_000, 4000, 191
N_ITERS = 8


def cascade(x, k):
    return topk_vals_desc(x, k)


def plain_topk(x, k):
    return jax.lax.top_k(x, k)[0]


def _bitonic_merge_desc(v):
    """Bitonic merge of a bitonic sequence along the last axis, descending.

    v: (..., n) with n a power of two.  log2(n) stages of static
    reshape + min/max — no sort network, no data-dependent control flow.
    """
    n = v.shape[-1]
    stride = n // 2
    while stride >= 1:
        w = v.reshape(v.shape[:-1] + (n // (2 * stride), 2, stride))
        hi = jnp.maximum(w[..., 0, :], w[..., 1, :])
        lo = jnp.minimum(w[..., 0, :], w[..., 1, :])
        v = jnp.concatenate([hi, lo], axis=-1).reshape(
            v.shape[:-1] + (n // (2 * stride), 2 * stride)
        ).reshape(v.shape)
        stride //= 2
    return v


def segsort_maxmerge(x, k, seg=256, resort=False):
    """Sort 256-wide segments, then fold pairs with the max-merge trick.

    Top-k of two descending lists A, B: max(A_i, reverse(B)_i) is a bitonic
    sequence holding the top-n of A ∪ B; a bitonic merge re-sorts it.
    """
    b, s = x.shape
    pad = (-s) % seg
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    g = x.shape[1] // seg
    v = jnp.sort(x.reshape(b, g, seg), axis=-1, descending=True)
    while g > 1:
        a_half = v[:, 0::2, :]
        b_half = v[:, 1::2, :]
        merged = jnp.maximum(a_half, b_half[:, :, ::-1])
        if resort:
            v = jnp.sort(merged, axis=-1, descending=True)
        else:
            v = _bitonic_merge_desc(merged)
        g = v.shape[1]
    return v[:, 0, :k]


def segsort_maxmerge_resort(x, k):
    return segsort_maxmerge(x, k, resort=True)


def cascade_1024(x, k):
    xs = x.reshape(x.shape[0], 4, 1000)
    pad = jnp.full(xs.shape[:-1] + (24,), -jnp.inf, x.dtype)
    xs = jnp.concatenate([xs, pad], axis=-1)
    w, _ = jax.lax.approx_max_k(xs, k, recall_target=1.0)
    w = w.reshape(x.shape[0], 4 * k)
    return jax.lax.approx_max_k(w, k, recall_target=1.0)[0]


def pallas_variant(x, k):
    from pyloo_tpu.ops.pallas_topk import pallas_topk_desc

    return pallas_topk_desc(x, k, variant="roll")


VARIANTS = {
    "pallas_bitonic": pallas_variant,
    "cascade_g4_1000": cascade,
    "segsort256_bitonic_merge": segsort_maxmerge,
    "segsort256_resort": segsort_maxmerge_resort,
    "segsort512_bitonic_merge": lambda x, k: segsort_maxmerge(x, k, seg=512),
    "plain_topk": plain_topk,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    # correctness check on a small adversarial case (ties, -inf rows)
    key = jax.random.PRNGKey(0)
    small = jax.random.normal(key, (64, S), jnp.float32)
    small = small.at[0].set(0.0)  # all ties
    small = small.at[1].set(-jnp.inf)
    want = jax.lax.top_k(small, K)[0]
    for name in names:
        fn = VARIANTS[name]
        got = fn(small, K)
        ok = bool(jnp.all(got == want) | jnp.all(jnp.isclose(got, want)))
        print(f"{name}: exact={ok}", flush=True)
        if not ok:
            bad = int(jnp.sum(jnp.any(got != want, axis=1)))
            print(f"  mismatch rows: {bad}", flush=True)

    base = [
        1.5 * jax.random.normal(jax.random.PRNGKey(i), (B, S), jnp.float32)
        for i in range(2)
    ]
    _ = [float(c[0, 0]) for c in base]

    for name in names:
        fn = VARIANTS[name]

        @jax.jit
        def run(chunk, salt, fn=fn):
            return jnp.sum(fn(chunk + salt, K))

        r = run(base[0], jnp.float32(0.0))
        _ = float(r)  # compile + warm
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(N_ITERS):
            acc = acc + run(base[i % 2], jnp.float32(i) * jnp.float32(1e-6))
        _ = float(acc)
        wall = time.perf_counter() - t0
        print(
            f"{name}: {wall / N_ITERS * 1e3:.1f} ms/chunk "
            f"({B * N_ITERS / wall / 1e3:.0f}k rows/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
