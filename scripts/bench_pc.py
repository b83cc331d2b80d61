"""ViT-L pc-Lens encode throughput on the real chip (companion to bench.py;
README's pc number). Methodology identical to bench.py: chained iterations
inside one jit, host-fetch fence, best of 3.

Run:  timeout 580 python scripts/bench_pc.py
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
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # block_until_ready is a no-op on axon; host-fetch fences

    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri

    cfg = make_model_config("ViT-L-14", "pc")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    npts = cfg.tower.point.npoints
    pc = jnp.asarray(np.random.RandomState(0).randn(BATCH, npts, 3) * 0.3,
                     jnp.float32)

    @jax.jit
    def encode_loop(params, state, pc):
        def body(carry, _):
            f, _s = tri.encode_visual(params, state, carry, cfg,
                                      normalize=True,
                                      compute_dtype=jnp.bfloat16)
            nxt = carry + 1e-6 * jnp.mean(f)
            return nxt, jnp.mean(f)

        _, outs = jax.lax.scan(body, pc, None, length=ITERS)
        return outs

    t0 = time.time()
    np.asarray(encode_loop(params, state, pc))
    compile_s = time.time() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        np.asarray(encode_loop(params, state, pc))
        best = max(best, BATCH * ITERS / (time.time() - t0))
    print(json.dumps({"metric": "vitL_pc_lens_encode_samples_per_sec_per_chip",
                      "value": round(best, 2), "batch": BATCH,
                      "npoints": npts, "compile_s": round(compile_s, 1)}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
