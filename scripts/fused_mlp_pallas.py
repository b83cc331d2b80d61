"""Prototype: fused Pallas resblock-MLP kernel for the ViT-L D=1024 shapes.

VERDICT r1 next-round #2(c): "prototype ONE fused Pallas resblock
(attention+MLP with weights VMEM-resident) for the D=1024 shape — if the
wall is per-matmul overhead, fusion is the standard answer; if it loses,
write the number down as a dead end."

Full-resblock weight residency is impossible on v5e (25 MB bf16 weights vs
~16 MB VMEM, and XLA attention already beats the Pallas flash kernel below
KV~4096 — CLAUDE.md perf facts), so the honest fusion target is the MLP:
    out = x + (gelu(ln2(x) @ W1 + b1)) @ W2 + b2
which is 2/3 of the block FLOPs and whose hidden activation h
([16448, 4096] bf16 = 135 MB) makes TWO HBM round trips in the XLA
schedule (fc1 write + proj read). The kernel streams W1/W2 in hidden
chunks (grid dim j), keeps h in VMEM only, accumulates the proj output in
an fp32 scratch, and adds the residual + bias at the last chunk.

Numerics match vitlens_tpu.models.layers.resblock lines 178-182: fp32 LN,
erf GELU, bf16 matmuls with fp32 accumulation.

Run:  timeout 540 python scripts/fused_mlp_pallas.py
Prints one JSON line per variant {name, ms, tflops} and a verdict line.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 1024
HIDDEN = 4096
M = 64 * 257  # bench batch 64 x (256 patches + CLS)
ITERS = 30


def _gelu_erf(x32):
    # Mosaic lowers neither erf nor erfc, so the kernel uses the tanh
    # approximation (max deviation from exact ~1e-3 relative — below bf16
    # rounding, 2^-8). The XLA comparator keeps exact erf.
    return jax.nn.gelu(x32, approximate=True)


def fused_mlp_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, out_ref, acc_ref):
    """One (m-tile, hidden-chunk) grid step.

    x_ref:  (TM, D) bf16      lnw/lnb: (1, D) fp32
    w1_ref: (D, TH) bf16      b1_ref:  (1, TH) fp32
    w2_ref: (TH, D) bf16      b2_ref:  (1, D) fp32
    out_ref:(TM, D) bf16      acc_ref: (TM, D) fp32 scratch
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    # fp32 LayerNorm (recomputed per hidden chunk; ~0.3% of chunk FLOPs)
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y32 = y32 * lnw_ref[0, :] + lnb_ref[0, :]
    y = y32.astype(jnp.bfloat16)

    h32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_erf(h32 + b1_ref[0, :]).astype(jnp.bfloat16)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = x32 + b2_ref[0, :] + part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def fused_mlp(x, lnw, lnb, w1, b1, w2, b2, *, tm=512, th=2048):
    m, d = x.shape
    hidden = w1.shape[1]
    grid = (pl.cdiv(m, tm), hidden // th)
    return pl.pallas_call(
        fused_mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, th), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
            # the double-buffered weight blocks at useful tile sizes.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * hidden,
            bytes_accessed=2 * (m * d * 3 + d * hidden * 2),
            transcendentals=m * hidden,
        ),
    )(x, lnw, lnb, w1, b1, w2, b2)


def xla_mlp(x, lnw, lnb, w1, b1, w2, b2):
    """The model's current schedule (layers.py:178-182)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(x.dtype)
    h = y @ w1 + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return x + (h @ w2 + b2.astype(x.dtype))


def bench(fn, args, iters=ITERS):
    """Chained iterations inside one jit (tunnel methodology, CLAUDE.md)."""

    @jax.jit
    def loop(x, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            return out, ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        # scalar output: the device tunnel transfers ~55 MB/s, so fetching
        # the full [M, D] activation would dominate the measurement.
        return jnp.mean(y.astype(jnp.float32))

    t0 = time.time()
    np.asarray(loop(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best, compile_s


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, D) * 0.02, jnp.bfloat16)
    lnw = jnp.asarray(rng.rand(1, D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, HIDDEN) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(1, HIDDEN) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(HIDDEN, D) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(1, D) * 0.01, jnp.float32)

    flops = 4 * M * D * HIDDEN  # two matmuls, 2*M*K*N each

    # correctness first (single call, relative error vs fp32-ish XLA path)
    want = np.asarray(xla_mlp(x, lnw[0], lnb[0], w1, b1[0], w2, b2[0]),
                      np.float32)
    results = {}
    for tm, th in [(512, 2048), (1024, 2048), (512, 1024), (2048, 2048),
                   (256, 2048), (512, 4096), (256, 1024), (1024, 4096)]:
        name = f"pallas_tm{tm}_th{th}"
        try:
            got = np.asarray(
                fused_mlp(x, lnw, lnb, w1, b1, w2, b2, tm=tm, th=th),
                np.float32)
            err = (np.abs(got - want).max()
                   / max(1e-6, np.abs(want).max()))
            if err > 2e-2:
                print(json.dumps({"name": name, "error":
                                  f"numerics {err:.3e}"}))
                continue
            sec, comp = bench(
                functools.partial(fused_mlp, tm=tm, th=th),
                (x, lnw, lnb, w1, b1, w2, b2))
            results[name] = sec
            print(json.dumps({"name": name, "ms": round(sec * 1e3, 3),
                              "tflops": round(flops / sec / 1e12, 1),
                              "max_rel_err": float(f"{err:.2e}"),
                              "compile_s": round(comp, 1)}))
        except Exception as e:  # noqa: BLE001 — prototype sweep
            print(json.dumps({"name": name, "error": repr(e)[:200]}))

    sec, comp = bench(xla_mlp, (x, lnw[0], lnb[0], w1, b1[0], w2, b2[0]))
    results["xla"] = sec
    print(json.dumps({"name": "xla_mlp", "ms": round(sec * 1e3, 3),
                      "tflops": round(flops / sec / 1e12, 1),
                      "compile_s": round(comp, 1)}))

    if results:
        best = min(results, key=results.get)
        ratio = results["xla"] / results[best]
        print(json.dumps({"verdict": best, "speedup_vs_xla":
                          round(ratio, 3)}))


if __name__ == "__main__":
    main()
