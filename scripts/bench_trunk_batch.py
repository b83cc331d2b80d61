"""Why is the ViT-L trunk slower per sample at B128 than B64?

Times the bare 24-block resblock stack on [B, 257, 1024] bf16 for
B in {64, 128} with the fused-MLP kernel on and off (the B128 < B64
inversion in pc/audio encode lives in the trunk — the tokenizer and
grouping stages scale fine, scripts/bench_pc_breakdown.py r3).

Run:  timeout 1500 python scripts/bench_trunk_batch.py
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

TOKENS = 257
D = 1024
LAYERS = 24
HEADS = 16
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main() -> int:
    x0 = jnp.ones((128, 128))
    np.asarray(x0 @ x0)

    from vitlens_tpu.models import layers as L
    from vitlens_tpu.ops import fused_mlp as FM

    params = L.transformer_init(jax.random.PRNGKey(0), D, LAYERS)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)

    results = {}
    for B in (64, 128, 256):
        x = jnp.asarray(np.random.RandomState(0).randn(B, TOKENS, D) * 0.02,
                        jnp.bfloat16)
        for kernel in (True, False):
            FM.set_fused_mlp_enabled(kernel)

            @jax.jit
            def loop(p, x):
                def outer(carry, _):
                    y = L.transformer(carry, p, HEADS, L.gelu)
                    return carry + 1e-6 * jnp.mean(y), jnp.mean(y)

                _, outs = jax.lax.scan(outer, x, None, length=ITERS)
                return outs

            t0 = time.time()
            np.asarray(loop(params, x))
            comp = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(loop(params, x))
                best = min(best, (time.time() - t0) / ITERS)
            key = f"B{B}_{'kernel' if kernel else 'xla'}"
            results[key] = {"ms": round(best * 1e3, 2),
                            "us_per_sample": round(best / B * 1e6, 1),
                            "compile_s": round(comp, 1)}
            print(json.dumps({"stage": key, **results[key]}), flush=True)
    FM.set_fused_mlp_enabled(True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
