"""bigG pc-Lens encode A/B: exact vs approx ball query (ops/fps.py).

The r3 breakdown put lax.top_k ball selection at ~71 ms of a ~193 ms B16
encode batch; approx_min_k at recall 0.95 is 2.2 ms on the isolated op
(scripts/bench_ball_query.py). This measures the claim end-to-end and
validates downstream quality: cosine(tower features exact-ball vs
approx-ball) per sample.

Run: timeout 1800 python scripts/bench_bigG_ball_ab.py
"""

from __future__ import annotations

import dataclasses
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
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
    from vitlens_tpu.train.openshape import vitlensG_tower_config

    cfg_approx = vitlensG_tower_config()
    cfg_exact = dataclasses.replace(
        cfg_approx, point=dataclasses.replace(cfg_approx.point,
                                              knn_exact=True))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = vision_tower_init(jax.random.PRNGKey(0), cfg_approx)

    def to_bf16(leaf):
        a = np.asarray(leaf)
        return a.astype(jnp.bfloat16) if a.dtype == np.float32 else a

    params = jax.device_put(jax.tree.map(to_bf16, params))
    state = jax.device_put(jax.tree.map(np.asarray, state))
    pc = jnp.asarray(np.random.RandomState(0).randn(
        BATCH, cfg_approx.point.npoints, 6) * 0.3, jnp.float32)

    def encode(cfg):
        def one(w, x):
            f, _ = vision_tower_apply(w["p"], w["s"], x, cfg,
                                      compute_dtype=jnp.bfloat16)
            return f

        return one

    w = {"p": params, "s": state}

    # feature agreement first (single pass each)
    f_ex = np.asarray(jax.jit(encode(cfg_exact))(w, pc), np.float32)
    f_ap = np.asarray(jax.jit(encode(cfg_approx))(w, pc), np.float32)
    cos = np.sum(f_ex * f_ap, -1) / (
        np.linalg.norm(f_ex, axis=-1) * np.linalg.norm(f_ap, axis=-1))
    print(json.dumps({"cos_min": round(float(cos.min()), 6),
                      "cos_mean": round(float(cos.mean()), 6)}), flush=True)

    for name, cfg in (("exact", cfg_exact), ("approx", cfg_approx)):
        one = encode(cfg)

        @jax.jit
        def loop(w, x):
            def body(carry, _):
                f = one(w, carry)
                return carry + 1e-6 * jnp.mean(f), jnp.mean(f)

            _, outs = jax.lax.scan(body, x, None, length=ITERS)
            return outs

        t0 = time.time()
        np.asarray(loop(w, pc))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(w, pc))
            best = min(best, (time.time() - t0) / ITERS)
        print(json.dumps({"variant": name,
                          "samples_per_s": round(BATCH / best, 1),
                          "ms_per_batch": round(best * 1e3, 1),
                          "compile_s": round(comp, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
