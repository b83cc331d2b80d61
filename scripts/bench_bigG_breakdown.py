"""Where does the bigG pc-Lens encode time go? Nested prefixes, bench.py
loop methodology, on the vitlensG/OpenShape serving shape (B16, N=10000,
PNSA tokenizer, 48-layer trunk skipping the first 16, perceiver depth 4).

  fps        = FPS centers only (ops/fps.py Pallas kernel, G=512)
  ball       = fps + ball-query top-k over N=10000
  tokenizer  = grouping + gathers + PNSA shared MLP + lift
  full       = tokenizer + perceiver + trunk + proj

Run:  timeout 1800 python scripts/bench_bigG_breakdown.py
(Each stage is a fresh compile through the remote service; budget
several minutes before first output.)
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

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def bench(fn, weights, pc, iters=ITERS):
    """`weights` (any pytree) is an EXPLICIT jit arg — closing over the
    4.3 GB bigG params bakes them into the jaxpr as constants, which makes
    lowering pathological and has wedged the chip before (CLAUDE.md)."""

    @jax.jit
    def loop(weights, pc):
        def body(carry, _):
            out = fn(weights, carry)
            nxt = carry + 1e-6 * out
            return nxt, out

        _, outs = jax.lax.scan(body, pc, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(weights, pc))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(weights, pc))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # block_until_ready no-op on axon; host-fetch fences
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.adapters.tokenizers import pnsa_tokenizer_apply
    from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
    from vitlens_tpu.ops.fps import ball_query, fps
    from vitlens_tpu.train.openshape import vitlensG_tower_config

    cfg = vitlensG_tower_config()
    pt = cfg.point
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = vision_tower_init(jax.random.PRNGKey(0), cfg)

    def to_bf16(leaf):
        a = np.asarray(leaf)
        return a.astype(jnp.bfloat16) if a.dtype == np.float32 else a

    params = jax.device_put(jax.tree.map(to_bf16, params))
    state = jax.device_put(jax.tree.map(np.asarray, state))
    pc = jnp.asarray(np.random.RandomState(0).randn(BATCH, pt.npoints, 6)
                     * 0.3, jnp.float32)

    def run_fps(_, carry):
        c = fps(carry[..., :3], pt.num_group, key=None)
        return jnp.mean(c)

    def run_ball(_, carry):
        xyz = carry[..., :3]
        c = fps(xyz, pt.num_group, key=None)
        idx = ball_query(xyz, c, pt.radius, pt.group_size)
        return jnp.mean(idx.astype(jnp.float32))

    def run_tokenizer(w, carry):
        (tokens, _), _ = pnsa_tokenizer_apply(
            w["p"], w["s"], carry, carry[..., :3], pt)
        return jnp.mean(tokens)

    def run_full(w, carry):
        f, _ = vision_tower_apply(w["p"], w["s"], carry, cfg,
                                  compute_dtype=jnp.bfloat16)
        return jnp.mean(f)

    adapter_w = {"p": params["adapter"], "s": state["adapter"]}
    full_w = {"p": params, "s": state}
    results = {}
    for name, fn, w in (("fps", run_fps, 0), ("ball", run_ball, 0),
                        ("tokenizer", run_tokenizer, adapter_w),
                        ("full_encode", run_full, full_w)):
        sec, comp = bench(fn, w, pc)
        results[name] = sec
        print(json.dumps({
            "stage": name, "ms_per_batch": round(sec * 1e3, 2),
            "samples_per_s": round(BATCH / sec, 1),
            "compile_s": round(comp, 1),
        }), flush=True)
    full = results["full_encode"]
    print(json.dumps({k + "_pct": round(100 * v / full, 1)
                      for k, v in results.items() if k != "full_encode"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
