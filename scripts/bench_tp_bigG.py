"""What does Megatron TP cost per chip on the bigG trunk? (VERDICT r2 item 6)

Single-chip EMULATION of the per-shard compute: under TP-s each chip runs
the same token stream through a width-sharded block (qkv out 3D/s -> local
heads/s attention -> out-proj [D/s, D] partial; MLP hidden H/s), then
all-reduces the two [M, D] partials per layer over ICI. The per-shard
block has exactly those local shapes, so its single-chip time IS the
TP compute time per chip; the all-reduce is estimated from ICI bandwidth
(not emulable on one chip) and reported separately.

Three configs per shard count:
  xla      — per-shard compute, XLA MLP path (what TP runs today: GSPMD
             cannot shard through the fused-MLP kernel's custom call)
  kernel   — per-shard compute with the fused-MLP Pallas kernel on the
             LOCAL shapes (what a shard_map-wrapped kernel would buy)
  full     — unsharded baseline (TP=1), kernel on (today's single-chip path)

Trunk: ViT-bigG-14 OpenShape serving shape — D=1664, heads 16, mlp
H=8192, 32 effective layers (48 minus 16 skipped), tokens 257, bf16.

Run:  timeout 1500 python scripts/bench_tp_bigG.py
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

B = int(os.environ.get("BENCH_BATCH", "16"))
TOKENS = 257
D = 1664
HEADS = 16
HIDDEN = 8192
LAYERS = 32
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
ICI_GBPS = 45e9  # v5e per-link per-direction; 2D torus ring all-reduce


def make_blocks(key, shard: int):
    """Stacked per-shard block params (bf16)."""
    ks = jax.random.split(key, 6)
    d3 = 3 * D // shard
    h = HIDDEN // shard
    dl = D // shard

    def init(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
            jnp.bfloat16)

    return {
        "ln_1": {"scale": jnp.ones((LAYERS, D), jnp.float32),
                 "bias": jnp.zeros((LAYERS, D), jnp.float32)},
        "attn": {"qkv_w": init(ks[0], (LAYERS, D, d3), D ** -0.5),
                 "qkv_b": jnp.zeros((LAYERS, d3), jnp.bfloat16),
                 "out_w": init(ks[1], (LAYERS, dl, D), dl ** -0.5),
                 "out_b": jnp.zeros((LAYERS, D), jnp.bfloat16)},
        "ln_2": {"scale": jnp.ones((LAYERS, D), jnp.float32),
                 "bias": jnp.zeros((LAYERS, D), jnp.float32)},
        "mlp": {"fc": {"w": init(ks[2], (LAYERS, D, h), D ** -0.5),
                       "b": jnp.zeros((LAYERS, h), jnp.bfloat16)},
                "proj": {"w": init(ks[3], (LAYERS, h, D), h ** -0.5),
                         "b": jnp.zeros((LAYERS, D), jnp.bfloat16)}},
    }


def bench_trunk(blocks, heads: int, iters: int = ITERS):
    from vitlens_tpu.models import layers as L

    @jax.jit
    def loop(blocks, x):
        def step(carry, _):
            def body(h, lp):
                return L.resblock(h, lp, heads, L.gelu), None

            y, _ = jax.lax.scan(body, carry, blocks)
            return carry + 1e-6 * jnp.mean(y), jnp.mean(y)

        _, outs = jax.lax.scan(step, x, None, length=iters)
        return outs

    x = jnp.asarray(np.random.RandomState(0).randn(B, TOKENS, D) * 0.02,
                    jnp.bfloat16)
    t0 = time.time()
    np.asarray(loop(blocks, x))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(blocks, x))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def allreduce_ms(shard: int) -> float:
    """Ring all-reduce time estimate for the 2 per-layer [B,T,D] bf16
    partial sums over `shard` chips: 2*(s-1)/s * bytes / ICI_GBPS each."""
    if shard == 1:
        return 0.0
    bytes_per = B * TOKENS * D * 2
    per_ar = 2 * (shard - 1) / shard * bytes_per / ICI_GBPS
    return 2 * LAYERS * per_ar * 1e3


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.ops import fused_mlp as FM

    results = {}
    for shard in (1, 2, 4):
        blocks = make_blocks(jax.random.PRNGKey(0), shard)
        heads = HEADS // shard
        for mode in (("kernel", True), ("xla", False)):
            name, use_kernel = mode
            if shard == 1 and not use_kernel:
                continue  # baseline runs kernel-on only
            FM.set_fused_mlp_enabled(use_kernel)
            sec, comp = bench_trunk(blocks, heads)
            key = f"tp{shard}_{name}"
            results[key] = {
                "ms_per_trunk_pass": round(sec * 1e3, 2),
                "compile_s": round(comp, 1),
            }
            print(json.dumps({"stage": key, **results[key]}), flush=True)
        del blocks
    FM.set_fused_mlp_enabled(True)

    full = results["tp1_kernel"]["ms_per_trunk_pass"]
    out = {"batch": B, "layers": LAYERS, "tokens": TOKENS,
           "full_trunk_ms": full}
    for shard in (2, 4):
        ar = allreduce_ms(shard)
        for name in ("xla", "kernel"):
            c = results[f"tp{shard}_{name}"]["ms_per_trunk_pass"]
            out[f"tp{shard}_{name}"] = {
                "compute_ms": c,
                "allreduce_est_ms": round(ar, 2),
                "est_total_ms": round(c + ar, 2),
                "speedup_vs_single_chip": round(full / (c + ar), 2),
                "parallel_efficiency_pct": round(
                    100 * full / ((c + ar) * shard), 1),
            }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
