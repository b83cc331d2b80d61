"""A/B the fused-MLP kernel inside a TRAINING-shaped graph on the real chip.

Measures value_and_grad of a remat'd 24-block ViT-L trunk forward (grads
flow through every block to the input — the Lens-training pattern where the
trunk is frozen but the adapter below it trains), fused kernel vs plain
XLA, iterations chained inside one jit (tunnel methodology, CLAUDE.md).
The CLI-level A/B is unusable for this: the schedule bakes total_steps into
the graph (compile-cache miss per config) and per-step host transfers
(~110 MB) dominate through the tunnel.

Run:  timeout 580 python scripts/bench_train_mlp.py
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

B, N, D, LAYERS, HEADS = 64, 257, 1024, 24, 16
ITERS = 10


def main() -> int:
    x0 = jnp.ones((128, 128))
    np.asarray(x0 @ x0)  # block_until_ready is a no-op on axon; host-fetch fences

    from vitlens_tpu.models import layers as L
    from vitlens_tpu.ops import fused_mlp as FM

    params = L.transformer_init(jax.random.PRNGKey(0), D, LAYERS)
    params = jax.tree.map(lambda t: t.astype(jnp.float32), params)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, D) * 0.02,
                    jnp.bfloat16)

    def make_step(use_fused):
        def loss(pp, xx):
            out = L.transformer(xx, pp, HEADS, L.gelu, remat=True)
            return jnp.mean(out.astype(jnp.float32))

        def step(pp, xx):
            # params as an ARGUMENT (never a baked constant: 1.2 GB of
            # closure constants makes lowering/compile pathological)
            val, gx = jax.value_and_grad(loss, argnums=1)(pp, xx)
            # tiny outputs only: the tunnel transfers ~55 MB/s
            return val, jnp.mean(gx.astype(jnp.float32))

        # availability is resolved at TRACE time — patch, trace, restore
        orig = FM.fused_mlp_available
        FM.fused_mlp_available = lambda: use_fused
        try:
            lowered = jax.jit(step).lower(params, x)
        finally:
            FM.fused_mlp_available = orig
        return lowered.compile()

    results = {}
    for name, use_fused in (("xla", False), ("fused", True)):
        t0 = time.time()
        fn = make_step(use_fused)
        compile_s = time.time() - t0
        jax.tree.map(np.asarray, fn(params, x))  # warm
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.time()
            jax.tree.map(np.asarray, fn(params, x))
            best = min(best, time.time() - t0)
        results[name] = best
        print(json.dumps({"name": name, "ms_per_fwdbwd": round(best * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
    print(json.dumps({"fused_speedup_vs_xla":
                      round(results["xla"] / results["fused"], 3)}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
