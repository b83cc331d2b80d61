"""Text-encode batch sweep + op decomposition (VERDICT r4 item 6): either
lift text_encode past the 50%-MFU bar with a bigger batch bucket, or pin
the ceiling with per-op evidence.

Shapes at B256/ctx 77/width 768: the trunk is 12 x [19712,768] matmuls
(qkv N=2304, out N=768, mlp N=3072 both ways) + tiny per-head [77,77]
attention. Sweeping B doubles the row count; the decomposition times each
matmul family standalone at the same shapes (methodology: in-jit scan,
host-fetch fence, best of 3 — CLAUDE.md tunnel rules).

Run:  timeout 1200 python scripts/bench_text_batch.py
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

BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", "256,512,1024").split(",")]
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def _fence(x):
    return np.asarray(x)


def _time_best(fn, args, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _fence(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    _fence(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri

    cfg = make_model_config("ViT-L-14", "audio")
    params, _ = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    # per-sample flops from the r4 driver-confirmed derivation
    # (BENCH_DETAIL.json text_encode_b256): 13.3 GF/sample
    GF = 13.3
    PEAK = 197e12  # v5e bf16

    rng = np.random.RandomState(0)
    results = {}
    for batch in BATCHES:
        ids = np.zeros((batch, 77), np.int32)
        ids[:, 0] = 49406
        lens = rng.randint(4, 76, size=batch)
        for i, n in enumerate(lens):
            ids[i, 1:n] = rng.randint(1, 49405, size=n - 1)
            ids[i, n] = 49407
        ids = jnp.asarray(ids)

        @jax.jit
        def loop(p, t):
            def body(carry, _):
                f = tri.encode_text(p, carry, cfg, normalize=True,
                                    compute_dtype=jnp.bfloat16)
                shift = jnp.isnan(jnp.mean(f)).astype(jnp.int32)
                return carry + shift, jnp.mean(f)

            _, outs = jax.lax.scan(body, t, None, length=ITERS)
            return outs

        t0 = time.time()
        _fence(loop(params, ids))
        comp = time.time() - t0
        dt = _time_best(loop, (params, ids)) / ITERS
        sps = batch / dt
        results[f"b{batch}"] = {
            "samples_per_s": round(sps, 1),
            "ms_per_batch": round(dt * 1e3, 2),
            "mfu_pct": round(100 * sps * GF * 1e9 / PEAK, 1),
            "compile_s": round(comp, 1),
        }
        print(json.dumps({f"b{batch}": results[f"b{batch}"]}), flush=True)

    # --- decomposition at B256 rows: each matmul family standalone -------
    M = 256 * 77
    decomp = {}
    for name, k, n in [("qkv", 768, 2304), ("out", 768, 768),
                       ("mlp_fc", 768, 3072), ("mlp_proj", 3072, 768)]:
        a = jnp.asarray(rng.randn(M, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

        @jax.jit
        def mm_loop(a, w):
            def body(c, _):
                y = c @ w
                # chain via a cheap projection back to the input shape
                return c + 0 * (y @ w.T).astype(c.dtype), jnp.mean(y)

            _, outs = jax.lax.scan(body, a, None, length=ITERS)
            return outs

        _fence(mm_loop(a, w))
        dt = _time_best(mm_loop, (a, w)) / ITERS
        # the chain adds one transposed matmul of the same size: halve
        tf = 2 * (2 * M * k * n) / dt / 1e12 / 2
        decomp[name] = {"tf_per_s_per_matmul": round(tf, 1),
                        "us": round(dt * 1e6 / 2, 1)}
        print(json.dumps({name: decomp[name]}), flush=True)

    print(json.dumps({"metric": "text_batch_sweep", "results": results,
                      "decomp_b256_rows": decomp}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
