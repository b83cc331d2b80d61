"""Where does text encode time go? (VERDICT r4 item 6: text_encode_b256 sits
at 47.7% MFU — below the repo's >=50% bar that every other flagship metric
clears. Decompose before deciding fix vs ceiling note.)

Nested/isolated pieces at the ViT-L text-tower geometry (width 768, 12
layers, heads 12, ctx 77, vocab 49408), bf16 compute, B=256 (and B512 for
the batch question):

  full       = tri.encode_text (embedding gather + trunk + ln/EOT/proj)
  trunk      = 12x resblock scan over precomputed [B,77,768] latents
  embed      = token-embedding gather [B*77] rows from [49408,768] + pos add
  head       = ln_final + EOT pool + text_projection + l2-normalize
  matmul ceilings of the trunk's exact shapes (rows = B*77):
    qkv   [R,768]@[768,2304]   attnout [R,768]@[768,768]
    fc    [R,768]@[768,3072]   proj    [R,3072]@[3072,768]
    scores [B*12,77,64]@[B*12,64,77] (batched, folded)

All weights ride as jit ARGS — closing over them bakes them into the
serialized graph and blows the remote-compile request-size limit
(HTTP 413; the CLAUDE.md constants pathology).

Run: timeout 3600 python scripts/bench_text_breakdown.py
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

ITERS = int(os.environ.get("BENCH_ITERS", "200"))
PEAK = 197e12  # v5e bf16


def bench(fn, carry0, params, iters=ITERS):
    """In-jit scan loop (tunnel-safe); carry chains via a tiny feedback.
    fn(carry, params) -> out; params is a traced jit ARG."""

    @jax.jit
    def loop(c, p):
        def body(carry, _):
            out = fn(carry, p)
            return carry + (1e-6 * jnp.mean(out)).astype(carry.dtype), \
                jnp.mean(out)

        _, outs = jax.lax.scan(body, c, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(carry0, params))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(carry0, params))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def bench_int_carry(fn, ids, params, iters=ITERS):
    """Variant for int token-id carries (the full-encode / embed cases):
    chain with a data-dependent 0 shift like bench.py does."""

    @jax.jit
    def loop(t, p):
        def body(carry, _):
            out = fn(carry, p)
            shift = jnp.isnan(jnp.mean(out)).astype(jnp.int32)
            return carry + shift, jnp.mean(out)

        _, outs = jax.lax.scan(body, t, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(ids, params))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(ids, params))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import layers as L
    from vitlens_tpu.models import tri
    from vitlens_tpu.ops.attention import causal_mask

    cfg = make_model_config("ViT-L-14", "audio")
    tc = cfg.text
    params, _ = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    # only the text tower rides to the device; the visual tower is dead
    # weight here (encode_text reads params["text"] alone, tri.py)
    tparams = {"text": params["text"]}
    tp = params["text"]
    del params
    rng = np.random.RandomState(0)

    batches = tuple(int(b) for b in os.environ.get(
        "BENCH_BATCHES", "256,512").split(","))
    results = {}
    for batch in batches:
        ids = np.zeros((batch, 77), np.int32)
        ids[:, 0] = 49406
        lens = rng.randint(4, 76, size=batch)
        for i, n in enumerate(lens):
            ids[i, 1:n] = rng.randint(1, 49405, size=n - 1)
            ids[i, n] = 49407
        ids = jnp.asarray(ids)
        mask = causal_mask(77)
        lat = jnp.asarray(
            rng.randn(batch, 77, tc.width) * 0.02, jnp.bfloat16)

        def full(t, p):
            return tri.encode_text(p, t, cfg, normalize=True,
                                   compute_dtype=jnp.bfloat16)

        def trunk(x, p):
            return L.transformer(x, p["text"]["trunk"], tc.heads, L.gelu,
                                 mask=mask)

        def embed(t, p):
            x = jnp.take(p["text"]["token_embedding"], t, axis=0
                         ).astype(jnp.bfloat16)
            return x + p["text"]["positional_embedding"].astype(jnp.bfloat16)

        def head(x, p):
            y = L.layer_norm(x, p["text"]["ln_final"])
            pooled = y[:, 0]
            f = pooled @ p["text"]["text_projection"].astype(pooled.dtype)
            n = jnp.linalg.norm(f.astype(jnp.float32), axis=-1,
                                keepdims=True)
            return f / jnp.maximum(n, 1e-12)

        r = {}
        for name, f, a, intc in (
                ("full", full, ids, True),
                ("embed", embed, ids, True),
                ("trunk", trunk, lat, False),
                ("head", head, lat, False)):
            if intc:
                dt, comp = bench_int_carry(f, a, tparams)
            else:
                dt, comp = bench(f, a, tparams)
            r[name] = {"ms": round(dt * 1e3, 3),
                       "compile_s": round(comp, 1)}
            print(json.dumps({f"b{batch}_{name}": r[name]}), flush=True)
        r["sps_full"] = round(batch / (r["full"]["ms"] / 1e3), 1)
        results[f"b{batch}"] = r

    # matmul ceilings at the trunk's exact shapes (rows from the first
    # BENCH_BATCHES entry)
    bm = batches[0]
    R = bm * 77
    shapes = {
        "qkv": ((R, 768), (768, 2304)),
        "attnout": ((R, 768), (768, 768)),
        "fc": ((R, 768), (768, 3072)),
        "proj": ((R, 3072), (3072, 768)),
    }
    mm = {}
    for name, (sa, sb) in shapes.items():
        a = jnp.asarray(rng.randn(*sa) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.randn(*sb) * 0.02, jnp.bfloat16)

        def f(a, b):
            return a @ b

        dt, _ = bench(f, a, b)
        fl = 2 * sa[0] * sa[1] * sb[1]
        mm[name] = {"ms": round(dt * 1e3, 3),
                    "tflops": round(fl / dt / 1e12, 1),
                    "mfu_pct": round(100 * fl / dt / PEAK, 1)}
        print(json.dumps({name: mm[name]}), flush=True)
    # batched attention scores (folded heads)
    q = jnp.asarray(rng.randn(bm * 12, 77, 64) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(bm * 12, 64, 77) * 0.1, jnp.bfloat16)

    def scores(q, k):
        return jnp.einsum("bij,bjk->bik", q, k)

    dt, _ = bench(scores, q, k)
    fl = 2 * bm * 12 * 77 * 64 * 77
    mm["scores"] = {"ms": round(dt * 1e3, 3),
                    "tflops": round(fl / dt / 1e12, 1),
                    "mfu_pct": round(100 * fl / dt / PEAK, 1)}
    print(json.dumps({"scores": mm["scores"]}), flush=True)

    out = {"metric": "text_breakdown", "batches": results, "matmuls": mm}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
