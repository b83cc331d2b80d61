"""Matmul shape microbenchmark: makes the CLAUDE.md/BASELINE ceiling claims
reproducible (VERDICT r1 weak-#2: "no microbench script is checked in").

Measures bf16 matmul TF/s on the real chip for (a) large square shapes (the
chip's practical matmul ceiling) and (b) every hot ViT-L-14 Lens-encode shape
at the bench batch (64 x 257 tokens = 16448 rows). Methodology matches
bench.py: iterations chained INSIDE one jit via lax.scan (the tunnel's
block_until_ready is a no-op and per-dispatch latency is ~15-20 ms), fenced
by a host fetch.

Run:  timeout 540 python scripts/microbench.py [--iters 30]
Prints one JSON line per shape plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

V5E_BF16_PEAK = 197e12

# (M, K, N, tag). 16448 = bench batch 64 x 257 tokens.
SHAPES = [
    # chip ceiling probes
    (16384, 4096, 4096, "ceiling_4096_square"),
    (16384, 8192, 8192, "ceiling_8192_square"),
    # ViT-L trunk hot shapes (D=1024, MLP 4x)
    (16448, 1024, 1024, "vitL_attn_out_proj"),
    (16448, 1024, 3072, "vitL_qkv_proj"),
    (16448, 1024, 4096, "vitL_mlp_fc"),
    (16448, 4096, 1024, "vitL_mlp_proj"),
    # attention score/value shapes per (batch*heads): folded to one big dot
    (64 * 16 * 257, 64, 257, "vitL_attn_scores_bh_folded"),
    # what the same-FLOP matmul looks like at a kinder aspect ratio
    (4112, 4096, 4096, "vitL_mlp_fc_equivalent_square"),
]


def bench_matmul(m: int, k: int, n: int, iters: int) -> float:
    a = jnp.asarray(np.random.RandomState(0).randn(m, k), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).randn(k, n), jnp.bfloat16)

    @jax.jit
    def loop(a, b):
        def body(carry, _):
            c = carry @ b  # [m,n]
            # chain through a cheap rank-preserving op back to [m,k]
            nxt = a + jnp.sum(c, axis=1, keepdims=True).astype(a.dtype) * 1e-6
            return nxt, c[0, 0]

        _, outs = jax.lax.scan(body, a, None, length=iters)
        return outs

    np.asarray(loop(a, b))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(a, b))
        best = min(best, time.time() - t0)
    flops = 2.0 * m * k * n * iters
    return flops / best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # tunnel warmup

    results = {}
    for m, k, n, tag in SHAPES:
        tfs = bench_matmul(m, k, n, args.iters) / 1e12
        results[tag] = round(tfs, 1)
        print(json.dumps({
            "shape": [m, k, n], "tag": tag, "tflops_per_s": round(tfs, 1),
            "pct_of_peak": round(tfs * 1e12 / V5E_BF16_PEAK * 100, 1),
        }), flush=True)

    ceiling = max(v for t, v in results.items() if t.startswith("ceiling"))
    d1024 = results["vitL_attn_out_proj"]
    print(json.dumps({
        "summary": "v5e bf16 matmul ceiling vs ViT-L D=1024 wall",
        "measured_ceiling_tflops": ceiling,
        "vitL_d1024_square_tflops": d1024,
        "device": str(jax.devices()[0]),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
