"""Is the text token-embedding lookup hitting the slow TPU row-gather?

The grouping gather measured ~0.9 us/row regardless of row width
(scripts/bench_gather_variants.py). The text tower gathers B*77 rows from
the [49408, width] embedding table per step — if that lowers the same way,
a B128 train step hides ~9 ms of serial gather. The blocked hi/lo trick
does NOT apply (vocab/128 = 386 blocks -> the [J, NB, C] intermediate is
GBs), but a single one-hot matmul or an iota-compare segment approach
might. First: measure what XLA actually does.

  table_gather   = table[ids]  (today's path, via jnp.take)
  onehot         = onehot(ids) @ table  (MXU, 49408-wide contraction)

Run: timeout 900 python scripts/bench_embed_gather.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

V, D = 49408, 512
B = int(os.environ.get("BENCH_BATCH", "128"))
T = 77
ITERS = int(os.environ.get("BENCH_ITERS", "200"))


def bench(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return carry + (1e-6 * out[:1, :1].sum()).astype(carry.dtype), out
        c, _ = jax.lax.scan(body, a[0], None, length=iters)
        return c

    np.asarray(loop(*args))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3  # ms per call


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(V, D), jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, V, size=(B * T,)), jnp.int32)

    def gather(tbl, i):
        return jnp.take(tbl, i, axis=0)

    def onehot(tbl, i):
        oh = (i[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, V), 1)).astype(tbl.dtype)
        return oh @ tbl

    r = {
        "rows": B * T,
        "gather_ms": round(bench(gather, table, ids), 3),
        "onehot_ms": round(bench(onehot, table, ids), 3),
    }
    print(json.dumps(r))


if __name__ == "__main__":
    main()
