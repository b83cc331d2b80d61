"""Fused LayerNorm + linear projection Pallas kernel: out = ln(x) @ W + b.

Covers the resblock FRONT half — ln_1 + the packed-QKV projection
(reference open_clip/transformer.py:253-263, `self.attention(self.ln_1(x))`
with torch MultiheadAttention's in_proj). The [M, D] LN output otherwise
makes an HBM round trip between the LN fusion and the qkv matmul, and the
D=1024 -> 3*D matmul is one of the shape-limited ops on v5e
(scripts/microbench.py: 63.6 TF/s standalone). The kernel tiles over
tokens, keeps Wqkv (6 MB bf16 at ViT-L) VMEM-resident across the grid,
and never materialises ln_1(x) in HBM.

Measured on v5e at the ViT-L encode shape (M=16448, D=1024): 1.07x over
the XLA schedule on the ISOLATED op (scripts/fused_ln_qkv_pallas.py) —
but 0.96x END-TO-END encode (447 vs 467 samples/s, reproducible): the
kernel boundary forces the packed [M, 3D] qkv through HBM, killing XLA's
in-context fusion of the projection with the attention split/transpose.
Kept as OPT-IN ONLY (`VITLENS_ENABLE_FUSED_LNQKV=1`) so the measurement
is reproducible and the op is available for shapes where it may win;
default path stays XLA.

Numerics match models/layers.py::layer_norm + linear: fp32 LN, bf16
matmul with fp32 accumulation (the kernel adds the bias in fp32 before
the output cast — slightly tighter than the XLA path's bf16 bias add).

Backward: custom_vjp. The LN output y is recomputed from x (elementwise,
no matmul), then exactly the 2 grad matmuls (dW, dy) + the closed-form
LN derivative — the same matmul count as the plain-XLA backward.
Verified against jax.grad of the XLA reference (tests/test_fused_ln_proj.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_MIN_ROWS = 4096  # below this the kernel's win does not cover its overhead

_INTERPRET = False  # tests flip this to run the kernel on CPU


def _kernel(x_ref, lnw_ref, lnb_ref, w_ref, b_ref, out_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y32 * lnw_ref[0, :] + lnb_ref[0, :]).astype(x_ref.dtype)
    acc = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + b_ref[0, :]).astype(out_ref.dtype)


def _pallas_ln_proj(x, lnw, lnb, w, b, *, eps: float, tm: int = 512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    out = w.shape[1]
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row(d), row(d),
            # constant index map: Wqkv is DMA'd once and stays in VMEM
            pl.BlockSpec((d, out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row(out),
        ],
        out_specs=pl.BlockSpec((tm, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # same cap rationale as ops/fused_mlp.py: 16 MB default rejects
            # the resident weights, ~100 MB slows terminal-side compiles
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * out,
            bytes_accessed=2 * (m * d + m * out + d * out),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x, lnw, lnb, w, b)


def _xla_reference(x, lnw, lnb, w, b, *, eps: float):
    """The plain schedule (models/layers.py layer_norm + linear)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps) * lnw[0] + lnb[0]
         ).astype(x.dtype)
    return y @ w + b[0].astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_op(eps: float):
    @jax.custom_vjp
    def op(x, lnw, lnb, w, b):
        return _pallas_ln_proj(x, lnw, lnb, w, b, eps=eps)

    def fwd(x, lnw, lnb, w, b):
        return _pallas_ln_proj(x, lnw, lnb, w, b, eps=eps), (x, lnw, lnb, w)

    def bwd(res, g):
        x, lnw, lnb, w = res
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xhat = (x32 - mean) * inv
        y = (xhat * lnw[0] + lnb[0]).astype(x.dtype)

        db = jnp.sum(g.astype(jnp.float32), 0, keepdims=True)
        dw = (y.T @ g).astype(w.dtype)
        dy32 = (g @ w.T).astype(jnp.float32)

        dlnw = jnp.sum(dy32 * xhat, 0, keepdims=True)
        dlnb = jnp.sum(dy32, 0, keepdims=True)
        dxhat = dy32 * lnw[0]
        dx = (inv * (dxhat
                     - jnp.mean(dxhat, -1, keepdims=True)
                     - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
              ).astype(x.dtype)
        return dx, dlnw, dlnb, dw, db

    op.defvjp(fwd, bwd)
    return op


def fused_ln_proj_available() -> bool:
    import os

    # opt-in only: measured 4% SLOWER end-to-end at the ViT-L encode shape
    # (see module docstring) even though the isolated op wins 7%
    if not os.environ.get("VITLENS_ENABLE_FUSED_LNQKV"):
        return False
    from vitlens_tpu.ops.platform import is_tpu_default

    return is_tpu_default()


def fused_ln_proj_applicable(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    """Shape gate. x is the [B, N, D] (or [M, D]) resblock input, w the
    packed [D, 3D] qkv weight."""
    if x.dtype != jnp.bfloat16:
        return False
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows >= _MIN_ROWS and d % 128 == 0 and w.shape[1] % 128 == 0


def fused_ln_qkv(x: jnp.ndarray, ln_p: Params, attn_p: Params,
                 ln_eps: float = 1e-5) -> jnp.ndarray:
    """x [..., D] -> ln(x) @ qkv_w + qkv_b via the kernel; returns [..., 3D]."""
    d = x.shape[-1]
    out = attn_p["qkv_w"].shape[1]
    op = _make_op(float(ln_eps))
    qkv = op(
        x.reshape(-1, d),
        ln_p["scale"].astype(jnp.float32).reshape(1, d),
        ln_p["bias"].astype(jnp.float32).reshape(1, d),
        attn_p["qkv_w"].astype(x.dtype),
        attn_p["qkv_b"].astype(jnp.float32).reshape(1, out),
    )
    return qkv.reshape(x.shape[:-1] + (out,))
