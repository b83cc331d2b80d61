"""Isolated fused-MLP kernel throughput vs row count and tile size.

The trunk bench (bench_trunk_batch.py) shows the kernel's 15% block-level
win at 16448 rows collapsing to ~1% at 32896 rows (the B128 inversion's
kernel component). This times the OP alone — production kernel
(ops/fused_mlp.py) at tm in {256, 512, 1024} vs the XLA reference — at
both row counts to see whether the cliff is in the kernel itself and
whether tm recovers it.

Run:  timeout 1200 python scripts/bench_fused_mlp_rows.py
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

D = 1024
H = 4096
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main() -> int:
    x0 = jnp.ones((128, 128))
    np.asarray(x0 @ x0)

    from vitlens_tpu.ops import fused_mlp as FM

    rng = np.random.RandomState(0)
    lnw = jnp.ones((1, D), jnp.float32)
    lnb = jnp.zeros((1, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(D, H) * D ** -0.5, jnp.bfloat16)
    b1 = jnp.zeros((1, H), jnp.float32)
    w2 = jnp.asarray(rng.randn(H, D) * H ** -0.5, jnp.bfloat16)
    b2 = jnp.zeros((1, D), jnp.float32)

    def bench(fn, m):
        x = jnp.asarray(rng.randn(m, D) * 0.02, jnp.bfloat16)

        @jax.jit
        def loop(x, lnw, lnb, w1, b1, w2, b2):
            def body(carry, _):
                out = fn(carry, lnw, lnb, w1, b1, w2, b2)
                return out.astype(carry.dtype) * 0.5 + carry * 0.5, ()

            y, _ = jax.lax.scan(body, x, None, length=ITERS)
            return y

        np.asarray(loop(x, lnw, lnb, w1, b1, w2, b2))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(x, lnw, lnb, w1, b1, w2, b2))
            best = min(best, (time.time() - t0) / ITERS)
        tf = 4 * m * D * H / best / 1e12
        return best, tf

    for m in (16448, 32896):
        sec, tf = bench(
            lambda x, *a: FM._xla_reference(x, *a, act="gelu", eps=1e-5), m)
        print(json.dumps({"rows": m, "variant": "xla",
                          "ms": round(sec * 1e3, 3),
                          "tflops": round(tf, 1)}), flush=True)
        for tm in (256, 512, 1024):
            sec, tf = bench(
                lambda x, *a, _tm=tm: FM._pallas_fused_mlp(
                    x, *a, act="gelu", eps=1e-5, tm=_tm), m)
            print(json.dumps({"rows": m, "variant": f"kernel_tm{tm}",
                              "ms": round(sec * 1e3, 3),
                              "tflops": round(tf, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
