"""Why is the grouping gather 14.5 ms? A/B of gather formulations for
neighborhood = xyz[idx] at the flagship shape (B=64, N=8192, G=512, M=32,
bf16). Hypothesis: XLA's TPU gather of rows with a 3-wide trailing dim
degenerates; 128-lane-aligned rows should go at HBM bandwidth.

  take3     = today's vmap take on [B,N,3]
  take128   = same gather on [B,N,128] zero-padded xyz, then slice [:3]
  proj128   = gather rows of (xyz @ W)[B,N,128] (the conv1-projected form
              that point_tokenizer_apply could consume directly)
  onehot    = chunked one-hot matmul lower bound (reference point only)

Run: timeout 1200 python scripts/bench_gather_variants.py
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

B = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
G, M, N = 512, 32, 8192


def bench(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return carry + (1e-6 * out).astype(carry.dtype), out

        _, outs = jax.lax.scan(body, a[0], None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(*args))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(B, N, 3) * 0.3, jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, size=(B, G * M)), jnp.int32)
    w = jnp.asarray(rng.randn(3, 128) * 0.1, jnp.bfloat16)

    def take3(pc, ind):
        out = jax.vmap(lambda p, i: p[i])(pc, ind)
        return jnp.mean(out.astype(jnp.float32))

    def take128(pc, ind):
        pad = jnp.pad(pc, ((0, 0), (0, 0), (0, 125)))
        out = jax.vmap(lambda p, i: p[i])(pad, ind)
        return jnp.mean(out[..., :3].astype(jnp.float32))

    def proj128(pc, ind, ww):
        proj = pc @ ww  # [B,N,128]
        out = jax.vmap(lambda p, i: p[i])(proj, ind)
        return jnp.mean(out.astype(jnp.float32))

    def blocked(pc, ind):
        from vitlens_tpu.ops.fps import take_points
        out = take_points(pc, ind, blocked=True)
        return jnp.mean(out.astype(jnp.float32))

    def take_along(pc, ind):
        out = jnp.take_along_axis(pc, ind[:, :, None], axis=1)
        return jnp.mean(out.astype(jnp.float32))

    for name, fn, args in (
        ("take3", take3, (xyz, idx)),
        ("take_along3", take_along, (xyz, idx)),
        ("take128", take128, (xyz, idx)),
        ("proj128", proj128, (xyz, idx, w)),
        ("blocked", blocked, (xyz, idx)),
    ):
        sec, comp = bench(fn, *args)
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 3),
                          "compile_s": round(comp, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
