"""Prototype: fuse the attention OUT-projection + residual into the
resblock-MLP kernel.

Current split (after the fused-MLP kernel landed):
  XLA:    ctx = attention(ln1(x))          [B,H,N,dh] -> [M, D]
  XLA:    y   = x + ctx @ Wout + bout      (one more [M,D] HBM round trip)
  Pallas: out = y + act(ln2(y) @ W1) @ W2

Candidate single kernel: (x, ctx) -> x + ctx@Wout+bout -> ln2 -> MLP -> out.
Extra VMEM: Wout 2 MB; saves writing+reading y ([M,D] bf16 = 33 MB each
way per block) and runs the D=1024 out-proj at kernel matmul efficiency.

Run:  timeout 580 python scripts/fused_attnout_mlp_pallas.py
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
HIDDEN = 4096
M = 64 * 257
ITERS = 30


def _gelu(x32):
    return jax.nn.gelu(x32, approximate=True)  # erf unavailable in Mosaic


def kernel(x_ref, ctx_ref, wo_ref, bo_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
           w2_ref, b2_ref, out_ref):
    x32 = x_ref[:].astype(jnp.float32)
    proj = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    y32 = x32 + proj + bo_ref[0, :]
    y = y32.astype(x_ref.dtype)

    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    z32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
    z = (z32 * lnw_ref[0, :] + lnb_ref[0, :]).astype(x_ref.dtype)

    h32 = jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu(h32 + b1_ref[0, :]).astype(x_ref.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (y32 + b2_ref[0, :] + part).astype(out_ref.dtype)


def fused(x, ctx, wo, bo, lnw, lnb, w1, b1, w2, b2, *, tm=512):
    m, d = x.shape
    hidden = w1.shape[1]
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((tm, d), lambda i: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    const = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[tile(), tile(), const(d, d), row(d), row(d), row(d),
                  const(d, hidden), row(hidden), const(hidden, d), row(d)],
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * d + 4 * m * d * hidden,
            bytes_accessed=2 * (3 * m * d + d * d + 2 * d * hidden),
            transcendentals=m * hidden,
        ),
    )(x, ctx, wo, bo, lnw, lnb, w1, b1, w2, b2)


def xla_split(x, ctx, wo, bo, lnw, lnb, w1, b1, w2, b2):
    """Today's schedule: XLA out-proj+residual, then the fused-MLP kernel
    (approximated here by its XLA-equivalent math; the comparison constant
    cancels in the delta we care about)."""
    y = x + ctx @ wo + bo[0].astype(x.dtype)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    z = ((y32 - mean) * jax.lax.rsqrt(var + 1e-5) * lnw[0] + lnb[0]
         ).astype(x.dtype)
    h = _gelu((z @ w1 + b1[0].astype(x.dtype)).astype(jnp.float32))
    return y + (h.astype(x.dtype) @ w2 + b2[0].astype(x.dtype))


def bench(fn, args, iters=ITERS):
    @jax.jit
    def loop(x, ctx, *rest):
        def body(carry, _):
            # ctx must depend on the carry, else XLA hoists the
            # loop-invariant ctx@Wout out of the timing loop
            out = fn(carry, ctx + carry * jnp.bfloat16(1e-6), *rest)
            return out, ()

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
    ctx = jnp.asarray(rng.randn(M, D) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)
    lnw = jnp.asarray(rng.rand(1, D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, HIDDEN) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(1, HIDDEN) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(HIDDEN, D) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)
    args = (x, ctx, wo, bo, lnw, lnb, w1, b1, w2, b2)
    flops = 2 * M * D * D + 4 * M * D * HIDDEN

    want = np.asarray(xla_split(*args), np.float32)
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

    from vitlens_tpu.ops.fused_mlp import _pallas_fused_mlp

    def hybrid(x, ctx, wo, bo, lnw, lnb, w1, b1, w2, b2):
        """Production schedule today: XLA out-proj+residual, then the
        checked-in fused-MLP Pallas kernel."""
        y = x + ctx @ wo + bo[0].astype(x.dtype)
        return _pallas_fused_mlp(y, lnw, lnb, w1, b1, w2, b2,
                                 act="gelu", eps=1e-5)

    try:
        sec, comp = bench(hybrid, args)
        results["hybrid_today"] = sec
        print(json.dumps({"name": "xla_outproj_plus_pallas_mlp(today)",
                          "ms": round(sec * 1e3, 3),
                          "tflops": round(flops / sec / 1e12, 1),
                          "compile_s": round(comp, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": "hybrid_today", "error": repr(e)[:160]}),
              flush=True)

    sec, comp = bench(xla_split, args)
    results["xla_split"] = sec
    print(json.dumps({"name": "xla_outproj_plus_xla_mlp",
                      "ms": round(sec * 1e3, 3),
                      "tflops": round(flops / sec / 1e12, 1),
                      "compile_s": round(comp, 1)}), flush=True)
    if results:
        best = min(results, key=results.get)
        print(json.dumps({"verdict": best, "speedup_vs_xla_split":
                          round(results["xla_split"] / results[best], 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
