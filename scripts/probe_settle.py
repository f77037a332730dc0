"""Root-cause probe for the one-time ~10 s post-compile "settle" call.

bench.py's exact-f64 kernel shows the pattern [compile-call, ~10 s call,
then steady ~270 ms forever] on the axon TPU.  Two hypotheses:

A. *Call-anchored*: the second invocation itself performs one-time work
   (e.g. the server finalizes/loads the program image on first re-execute).
   Prediction: the ~10 s cost appears on call 2 no matter how long we wait
   after call 1.
B. *Wall-clock-anchored*: the server continues asynchronous post-compile
   work (autotuning pass, cache persist, executable upload) after call 1
   returns, and call 2 merely queues behind it.  Prediction: sleeping past
   the settle window before call 2 makes call 2 fast.

Run twice:  python scripts/probe_settle.py 0   (no sleep — reproduce settle)
            python scripts/probe_settle.py 15  (sleep 15 s — discriminate)

Uses the same f64 kernel + shape as bench.py's exact path so the compiled
program is the one that exhibits the behavior.  Appends one JSON line per
run to /tmp/settle_probe.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from pyloo_tpu.ops import tail_length
from pyloo_tpu.ops.loo_kernels import loo_scores_psis

SLEEP_S = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
ROWS, N_DRAWS = 8192, 4000  # bench.py half-chunk geometry

m_tail = tail_length(N_DRAWS, 1.0)
x32 = 1.5 * jax.random.normal(jax.random.PRNGKey(0), (ROWS, N_DRAWS), jnp.float32)
x = x32.astype(jnp.float64)
_ = float(x[0, 0])  # materialize outside any timing


@jax.jit
def smooth64(chunk, salt):
    salted = lax.dynamic_update_slice(chunk, chunk[:64] + salt, (0, 0))
    e, k, l = loo_scores_psis(-salted, m_tail)
    return jnp.sum(e)


t0 = time.perf_counter()
_ = float(smooth64(x, jnp.float64(0.0)))
compile_wall = time.perf_counter() - t0
print(f"call 1 (compile): {compile_wall:.2f} s")

if SLEEP_S:
    print(f"sleeping {SLEEP_S:.0f} s ...")
    time.sleep(SLEEP_S)

t0 = time.perf_counter()
_ = float(smooth64(x, jnp.float64(1e-6)))
second_wall = time.perf_counter() - t0
print(f"call 2 ({'after sleep' if SLEEP_S else 'immediate'}): {second_wall:.2f} s")

steady = []
for i in range(3):
    t0 = time.perf_counter()
    _ = float(smooth64(x, jnp.float64(i + 2) * 1e-6))
    steady.append(time.perf_counter() - t0)
print(f"steady: {[round(s, 3) for s in steady]}")

rec = {
    "sleep_s": SLEEP_S,
    "compile_wall_s": round(compile_wall, 2),
    "second_call_wall_s": round(second_wall, 3),
    "steady_wall_s": [round(s, 3) for s in steady],
    "platform": jax.devices()[0].platform,
}
with open("/tmp/settle_probe.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
