"""Prototype: fuse LN1 + QKV projection into one Pallas kernel.

Today the resblock front half is XLA: q,k,v = split(ln1(x) @ Wqkv + b).
Standalone microbench puts the [M,1024]@[1024,3072] qkv matmul at
63.6 TF/s (scripts/microbench.py) — if that per-op figure survived into
the model schedule, a VMEM-resident-weight kernel (Wqkv = 6 MB) doing
ln1+qkv in one pass would win like the fused MLP did. The attn-out
experiment (scripts/fused_attnout_mlp_pallas.py) showed XLA's in-context
schedule beats its standalone per-op numbers, so: measure, don't assume.

Run:  timeout 580 python scripts/fused_ln_qkv_pallas.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 1024
OUT = 3 * D
M = 64 * 257
ITERS = 30


def kernel(x_ref, lnw_ref, lnb_ref, w_ref, b_ref, out_ref):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    z32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    z = (z32 * lnw_ref[0, :] + lnb_ref[0, :]).astype(x_ref.dtype)
    acc = jnp.dot(z, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + b_ref[0, :]).astype(out_ref.dtype)


def fused(x, lnw, lnb, w, b, *, tm=512):
    m, d = x.shape
    out = w.shape[1]
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row(d), row(d),
            pl.BlockSpec((d, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row(out),
        ],
        out_specs=pl.BlockSpec((tm, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * out,
            bytes_accessed=2 * (m * d + m * out + d * out),
            transcendentals=0,
        ),
    )(x, lnw, lnb, w, b)


def xla_ref(x, lnw, lnb, w, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    z = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * lnw[0] + lnb[0]
         ).astype(x.dtype)
    return z @ w + b[0].astype(x.dtype)


def bench(fn, args, iters=ITERS):
    @jax.jit
    def loop(x, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            # fold [M,3D] back to [M,D] so the carry keeps the loop live
            nxt = (out[:, :D] + out[:, D:2 * D] * jnp.bfloat16(1e-3)
                   ).astype(carry.dtype)
            return nxt, ()

        yv, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(yv.astype(jnp.float32))

    t0 = time.time()
    np.asarray(loop(*args))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, D) * 0.02, jnp.bfloat16)
    lnw = jnp.asarray(rng.rand(1, D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)
    w = jnp.asarray(rng.randn(D, OUT) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.randn(1, OUT) * 0.01, jnp.float32)
    args = (x, lnw, lnb, w, b)
    flops = 2 * M * D * OUT

    want = np.asarray(xla_ref(*args), np.float32)
    results = {}
    for tm in (256, 512, 1024):
        name = f"fused_tm{tm}"
        try:
            got = np.asarray(fused(*args, tm=tm), np.float32)
            err = np.abs(got - want).max() / np.abs(want).max()
            if err > 2.5e-2:
                print(json.dumps({"name": name, "error": f"num {err:.2e}"}))
                continue
            sec, comp = bench(functools.partial(fused, tm=tm), args)
            results[name] = sec
            print(json.dumps({"name": name, "ms": round(sec * 1e3, 3),
                              "tflops": round(flops / sec / 1e12, 1),
                              "max_rel_err": float(f"{err:.2e}"),
                              "compile_s": round(comp, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(e)[:160]}),
                  flush=True)

    sec, comp = bench(xla_ref, args)
    results["xla"] = sec
    print(json.dumps({"name": "xla_ln_qkv", "ms": round(sec * 1e3, 3),
                      "tflops": round(flops / sec / 1e12, 1),
                      "compile_s": round(comp, 1)}), flush=True)
    if results:
        best = min(results, key=results.get)
        print(json.dumps({"verdict": best, "speedup_vs_xla":
                          round(results["xla"] / results[best], 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
