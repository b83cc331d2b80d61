"""Fused residual-MLP Pallas kernel: out = x + act(ln(x) @ W1 + b1) @ W2 + b2.

The MLP is ~64% of a ViT resblock's FLOPs, and XLA schedules it as two
matmuls with the hidden activation ([tokens, 4*width] bf16 — 135 MB at the
bench shape) making two HBM round trips. This kernel tiles over tokens,
keeps BOTH weight matrices VMEM-resident across the whole grid (v5e has
128 MB VMEM; ViT-L MLP weights are 16.8 MB bf16) and the hidden activation
never leaves VMEM. Measured on v5e at the ViT-L encode shape
(M=16448, D=1024, H=4096): 104 TF/s vs 85 TF/s for the XLA schedule
(scripts/fused_mlp_pallas.py sweep — tm=512, full hidden).

Numerics match models/layers.py:178-182: fp32 LayerNorm, bf16 matmuls with
fp32 accumulation. Mosaic lowers neither erf nor erfc, so exact-erf GELU
(torch nn.GELU default) uses the Abramowitz–Stegun 7.1.26 rational
approximation (max abs error 1.5e-7 — below fp32 LN noise, far below bf16
rounding at 2^-8).

Backward: custom_vjp with a direct formula. The diff-path forward streams
the pre-activation out of the kernel as a residual, so the backward runs
exactly the 4 grad matmuls (dW2, dh, dW1, dy) + the closed-form LN/act
derivatives — no forward recompute beyond what remat itself replays.
Verified against jax.grad of the XLA reference (tests/test_fused_mlp.py).

Reference semantics being accelerated: open_clip/transformer.py:253-272
(ResidualAttentionBlock.mlp path).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_MIN_ROWS = 4096  # below this the kernel's win does not cover its overhead

# Both weight matrices must stay VMEM-resident under the 64 MB scoped cap
# alongside the row tiles and the fp32 hidden intermediate. bigG-scale MLPs
# (D=1664, H=8192 -> 54.5 MB of weights) blow the budget at the default
# row tile: observed compile OOM "68.41M > 64.33M limit" at B32 tm=512
# (2026-08-17) — _pallas_fused_mlp clamps tm to 256 above _TM_CLAMP_BYTES
# (measured fitting and worth ~5% at bigG B16; tm=256 also wins on the
# isolated ViT-L op, scripts/bench_fused_mlp_rows.py). Shapes past
# _MAX_WEIGHT_BYTES are refused outright -> XLA MLP path.
_TM_CLAMP_BYTES = 32 * 1024 * 1024
_MAX_WEIGHT_BYTES = 56 * 1024 * 1024


def _gelu_erf_approx(x32: jnp.ndarray) -> jnp.ndarray:
    """0.5*x*(1+erf(x/sqrt(2))) with A&S 7.1.26 erf (|err| <= 1.5e-7)."""
    z = x32 * (2.0 ** -0.5)
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x32 * (1.0 + erf)


def _quick_gelu(x32: jnp.ndarray) -> jnp.ndarray:
    return x32 * jax.nn.sigmoid(1.702 * x32)


_KERNEL_ACTS = {"gelu": _gelu_erf_approx, "quick_gelu": _quick_gelu}


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *refs, act: str, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y32 = y32 * lnw_ref[0, :] + lnb_ref[0, :]
    y = y32.astype(x_ref.dtype)

    a32 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    a32 = a32 + b1_ref[0, :]
    h = _KERNEL_ACTS[act](a32).astype(x_ref.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (x32 + b2_ref[0, :] + part).astype(out_ref.dtype)
    if refs:  # save_preact: pre-activation residual for the backward pass
        refs[0][:] = a32.astype(refs[0].dtype)


_INTERPRET = False  # tests flip this to run the kernel on CPU

# Row-tile size. Isolated-op sweep at the ViT-L shapes (r3,
# scripts/bench_fused_mlp_rows.py): tm=256 beats 512 at both 16448 and
# 32896 rows; env override for A/B. Default flipped 512 -> 256 in r4 after
# pre-warming the compile cache and re-measuring every flagship figure
# on-chip at tm=256 (audio 471.8 vs 467, pc 405.3 vs 401, train 121.3/
# 122.8, bigG 128.5/132.4 — all >= the r3 tm=512 values; /tmp bench log
# 2026-08-19, recorded in CLAUDE.md).
def _default_tm() -> int:
    import os

    return int(os.environ.get("VITLENS_FUSED_MLP_TM", "256"))


def _pallas_fused_mlp(x, lnw, lnb, w1, b1, w2, b2, *, act: str, eps: float,
                      tm: int | None = None, save_preact: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tm is None:
        tm = _default_tm()
    m, d = x.shape
    hidden = w1.shape[1]
    if 4 * d * hidden > _TM_CLAMP_BYTES:  # 2 bf16 matrices = 4*d*h bytes
        tm = min(tm, 256)
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m, d), x.dtype)]
    out_specs = [pl.BlockSpec((tm, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if save_preact:
        out_shape.append(jax.ShapeDtypeStruct((m, hidden), x.dtype))
        out_specs.append(pl.BlockSpec((tm, hidden), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, eps=eps),
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row(d), row(d),
            # constant index maps: weights are DMA'd once and stay in VMEM
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(hidden),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(d),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the default 16 MB scoped-VMEM cap rejects the resident
            # weights; actual use is ~40 MB. Keep the cap at 64 MB — caps
            # near 100 MB made big remat'd training graphs' terminal-side
            # compile pathologically slow (same symptom CLAUDE.md records
            # for LIBTPU scoped_vmem=96M).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * hidden,
            bytes_accessed=2 * (2 * m * d + 2 * d * hidden),
            transcendentals=m * hidden,
        ),
        interpret=_INTERPRET,
    )(x, lnw, lnb, w1, b1, w2, b2)
    return out if save_preact else out[0]


def _xla_reference(x, lnw, lnb, w1, b1, w2, b2, *, act: str, eps: float):
    """The plain schedule (models/layers.py:178-182) — exact-erf gelu."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps) * lnw[0] + lnb[0])
    y = y.astype(x.dtype)
    h = y @ w1 + b1[0].astype(x.dtype)
    h = (jax.nn.gelu(h.astype(jnp.float32), approximate=False)
         if act == "gelu" else _quick_gelu(h.astype(jnp.float32)))
    h = h.astype(x.dtype)
    return x + (h @ w2 + b2[0].astype(x.dtype))


def _act_and_grad(act: str, a32: jnp.ndarray):
    """h = act(a), dh/da — exact closed forms in fp32."""
    if act == "gelu":
        cdf = 0.5 * (1.0 + jax.lax.erf(a32 * (2.0 ** -0.5)))
        pdf = jnp.exp(-0.5 * a32 * a32) * (1.0 / math.sqrt(2.0 * math.pi))
        return a32 * cdf, cdf + a32 * pdf
    s = jax.nn.sigmoid(1.702 * a32)
    return a32 * s, s + a32 * 1.702 * s * (1.0 - s)


@functools.lru_cache(maxsize=None)
def _make_op(act: str, eps: float):
    @jax.custom_vjp
    def op(x, lnw, lnb, w1, b1, w2, b2):
        return _pallas_fused_mlp(x, lnw, lnb, w1, b1, w2, b2,
                                 act=act, eps=eps)

    def fwd(x, lnw, lnb, w1, b1, w2, b2):
        # the diff path additionally streams out the pre-activation so the
        # backward needs NO forward recompute (4 grad matmuls only — the
        # same count as the plain-XLA backward, minus its remat-forward)
        out, a = _pallas_fused_mlp(x, lnw, lnb, w1, b1, w2, b2,
                                   act=act, eps=eps, save_preact=True)
        return out, (x, a, lnw, lnb, w1, w2)

    def bwd(res, g):
        x, a, lnw, lnb, w1, w2 = res
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xhat = (x32 - mean) * inv
        y = (xhat * lnw[0] + lnb[0]).astype(x.dtype)

        h32, dact = _act_and_grad(act, a.astype(jnp.float32))
        h = h32.astype(x.dtype)

        db2 = jnp.sum(g.astype(jnp.float32), 0, keepdims=True)
        dw2 = (h.T @ g).astype(w2.dtype)
        dh = g @ w2.T
        da32 = dh.astype(jnp.float32) * dact
        da = da32.astype(x.dtype)
        db1 = jnp.sum(da32, 0, keepdims=True)
        dw1 = (y.T @ da).astype(w1.dtype)
        dy32 = (da @ w1.T).astype(jnp.float32)

        dlnw = jnp.sum(dy32 * xhat, 0, keepdims=True)
        dlnb = jnp.sum(dy32, 0, keepdims=True)
        dxhat = dy32 * lnw[0]
        dx_ln = inv * (dxhat
                       - jnp.mean(dxhat, -1, keepdims=True)
                       - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
        dx = (g.astype(jnp.float32) + dx_ln).astype(x.dtype)
        return dx, dlnw, dlnb, dw1, db1, dw2, db2

    op.defvjp(fwd, bwd)
    return op


_FORCE_DISABLED = False


def set_fused_mlp_enabled(enabled: bool) -> None:
    """Programmatic kill switch. Tensor-parallel placement calls this with
    False (parallel/tp.py, parallel/fsdp.py::fsdp_tp_place): GSPMD cannot
    propagate the model-axis weight shardings through the opaque
    tpu_custom_call, so under TP the MLP must take the XLA path (whose
    matmuls shard as documented in SCALING.md)."""
    global _FORCE_DISABLED
    _FORCE_DISABLED = not enabled


def fused_mlp_available() -> bool:
    import os

    if _FORCE_DISABLED or os.environ.get("VITLENS_DISABLE_FUSED_MLP"):
        return False
    from vitlens_tpu.ops.platform import is_tpu_default

    return is_tpu_default()


def fused_mlp_applicable(x: jnp.ndarray, p: Params, act_name: str) -> bool:
    """Shape/act gate. x is the [B, N, D] (or [M, D]) resblock input;
    p the resblock param dict."""
    if act_name not in _KERNEL_ACTS or "ls_2" in p:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    d = x.shape[-1]
    hidden = p["mlp"]["fc"]["w"].shape[1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return (rows >= _MIN_ROWS and d % 128 == 0 and hidden % 128 == 0
            and 2 * 2 * d * hidden <= _MAX_WEIGHT_BYTES
            and "b" in p["mlp"]["fc"] and "b" in p["mlp"]["proj"])


def fused_mlp_block(x: jnp.ndarray, p: Params, act_name: str,
                    ln_eps: float = 1e-5) -> jnp.ndarray:
    """x [..., D] -> x + act(ln_2(x) @ fc + b) @ proj + b, via the kernel."""
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    op = _make_op(act_name, float(ln_eps))
    out = op(
        x2d,
        p["ln_2"]["scale"].astype(jnp.float32).reshape(1, d),
        p["ln_2"]["bias"].astype(jnp.float32).reshape(1, d),
        p["mlp"]["fc"]["w"].astype(x.dtype),
        p["mlp"]["fc"]["b"].astype(jnp.float32).reshape(1, -1),
        p["mlp"]["proj"]["w"].astype(x.dtype),
        p["mlp"]["proj"]["b"].astype(jnp.float32).reshape(1, d),
    )
    return out.reshape(x.shape)
