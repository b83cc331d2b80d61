"""Where does pc grouping time go? Nested prefixes, all bf16 (the dtype
the encode path actually runs grouping in), B=64 ViT-L geometry:

  fps        = FPS centers only (Pallas kernel)
  sqdist     = fps + pairwise sqdist matmul [B,G,N]
  knn        = sqdist + approx_min_k k=32
  gather     = knn + neighborhood gather + center-normalise (= group_points)

Run: timeout 1200 python scripts/bench_grouping_breakdown.py
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

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
G, M, N = 512, 32, 8192


def bench(fn, x, iters=ITERS):
    @jax.jit
    def loop(x):
        def body(carry, _):
            out = fn(carry)
            return carry + (1e-6 * out).astype(carry.dtype), out

        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(x))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)

    from vitlens_tpu.ops.fps import (fps, group_points, knn_indices,
                                     square_distance)

    pc = jnp.asarray(np.random.RandomState(0).randn(BATCH, N, 3) * 0.3,
                     jnp.bfloat16)

    def run_fps(c):
        return jnp.mean(fps(c, G).astype(jnp.float32))

    def run_sqdist(c):
        center = fps(c, G)
        return jnp.mean(square_distance(center, c).astype(jnp.float32))

    def run_knn(c):
        center = fps(c, G)
        idx = knn_indices(c, center, M)
        return jnp.mean(idx.astype(jnp.float32))

    def run_gather(c):
        nb, center = group_points(c, G, M)
        return jnp.mean(nb.astype(jnp.float32)) + jnp.mean(
            center.astype(jnp.float32))

    prev = 0.0
    for name, fn in (("fps", run_fps), ("sqdist", run_sqdist),
                     ("knn", run_knn), ("gather", run_gather)):
        sec, comp = bench(fn, pc)
        print(json.dumps({"stage": name, "ms": round(sec * 1e3, 3),
                          "delta_ms": round((sec - prev) * 1e3, 3),
                          "compile_s": round(comp, 1)}), flush=True)
        prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
