"""ViT-bigG-14 pc-Lens (vitlensG / OpenShape) encode throughput on one v5e.

The reference serves vitlensG from multi-GPU hosts; here the full 2.5 B-param
trunk runs single-chip with bf16 params (~5 GB HBM) — the inference-side
counterpart of the TP/FSDP training headroom in SCALING.md. Params are
initialised host-side then cast to bf16 before transfer.

Methodology matches bench.py: chained iterations inside one jit, host-fetch
fence, best of 3.

Run:  timeout 1500 python scripts/bench_bigG_pc.py
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
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # block_until_ready is a no-op on axon; host-fetch fences
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
    from vitlens_tpu.train.openshape import vitlensG_tower_config

    cfg = vitlensG_tower_config()
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = vision_tower_init(jax.random.PRNGKey(0), cfg)
    # bf16 params on the chip: bigG fp32 would be ~10 GB, bf16 ~5 GB
    def to_bf16(l):
        a = np.asarray(l)
        return a.astype(jnp.bfloat16) if a.dtype == np.float32 else a

    params = jax.device_put(jax.tree.map(to_bf16, params))
    state = jax.device_put(jax.tree.map(np.asarray, state))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(json.dumps({"stage": "init", "params_B": round(n_params / 1e9, 3)}),
          flush=True)

    pc = jnp.asarray(np.random.RandomState(0).randn(
        BATCH, cfg.point.npoints, 6) * 0.3, jnp.float32)

    @jax.jit
    def encode_loop(params, state, pc):
        def body(carry, _):
            f, _s = vision_tower_apply(params, state, carry, cfg,
                                       compute_dtype=jnp.bfloat16)
            nxt = carry + 1e-6 * jnp.mean(f)
            return nxt, jnp.mean(f)

        _, outs = jax.lax.scan(body, pc, None, length=ITERS)
        return outs

    t0 = time.time()
    np.asarray(encode_loop(params, state, pc))
    comp = time.time() - t0
    print(json.dumps({"stage": "compiled", "compile_s": round(comp, 1)}),
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(encode_loop(params, state, pc))
        best = min(best, (time.time() - t0) / ITERS)
    print(json.dumps({
        "metric": "vitbigG_pc_lens_encode_samples_per_sec_per_chip",
        "value": round(BATCH / best, 2),
        "batch": BATCH,
        "params_B": round(n_params / 1e9, 3),
        "ms_per_batch": round(best * 1e3, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
