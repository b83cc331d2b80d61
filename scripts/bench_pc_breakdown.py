"""Where does the pc-Lens encode time go? Times three nested prefixes of
the pipeline with identical loop methodology (bench.py style):

  grouping   = FPS + kNN + gather (ops/fps.py group_points)
  tokenizer  = grouping + mini-PointNet + pos MLP
  full       = tokenizer + perceiver + ViT-L trunk + proj

Run:  timeout 1500 python scripts/bench_pc_breakdown.py
(Three separate compiles + this tunnel's first-contact latency, measured
200-600 s on 2026-08-17, can exceed 10 minutes before the first line of
output — be patient. Results that informed the r2 grouping work, measured
separately via in-jit scan loops: grouping was 94 ms of a 232 ms B64
encode batch; after the batched-FPS kernel + kNN recall fix it is ~19 ms
of 167 ms.)
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


def bench(fn, pc, iters=ITERS):
    @jax.jit
    def loop(pc):
        def body(carry, _):
            out = fn(carry)
            nxt = carry + 1e-6 * out
            return nxt, out

        _, outs = jax.lax.scan(body, pc, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(pc))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(pc))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # block_until_ready is a no-op on axon; host-fetch fences

    from vitlens_tpu.adapters.tokenizers import (
        group_points, point_tokenizer_apply,
    )
    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri

    cfg = make_model_config("ViT-L-14", "pc")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    pt = cfg.tower.point
    pc = jnp.asarray(np.random.RandomState(0).randn(BATCH, pt.npoints, 3)
                     * 0.3, jnp.float32)

    def run_grouping(carry):
        nb, center = group_points(carry, pt.num_group, pt.group_size,
                                  key=None, knn_exact=pt.knn_exact)
        return jnp.mean(nb) + jnp.mean(center)

    tok_p = params["visual"]["adapter"]
    tok_s = state["visual"]["adapter"]

    def run_tokenizer(carry):
        (tokens, pos), _ = point_tokenizer_apply(tok_p, tok_s, carry, pt)
        return jnp.mean(tokens) + jnp.mean(pos)

    def run_full(carry):
        f, _ = tri.encode_visual(params, state, carry, cfg, normalize=True,
                                 compute_dtype=jnp.bfloat16)
        return jnp.mean(f)

    results = {}
    for name, fn in (("grouping", run_grouping),
                     ("tokenizer", run_tokenizer),
                     ("full_encode", run_full)):
        sec, comp = bench(fn, pc)
        results[name] = sec
        print(json.dumps({
            "stage": name, "ms_per_batch": round(sec * 1e3, 2),
            "samples_per_s": round(BATCH / sec, 1),
            "compile_s": round(comp, 1),
        }), flush=True)
    print(json.dumps({
        "grouping_pct": round(100 * results["grouping"]
                              / results["full_encode"], 1),
        "tokenizer_pct": round(100 * results["tokenizer"]
                               / results["full_encode"], 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
