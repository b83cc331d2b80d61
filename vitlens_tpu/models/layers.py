"""Core transformer building blocks, functional style.

Parameters are plain nested-dict pytrees; forward functions are pure and
jit/pjit-friendly. Weight layouts are chosen for the TPU MXU ([in, out]
matmuls, per-tower stacked layer params for `lax.scan`), NOT the torch
layouts — the converter in vitlens_tpu.weights handles the remap.

Numerical contracts mirrored from the reference (for frozen-weight parity):
  * LayerNorm computed in fp32, result cast back (transformer.py:17-25
    LayerNormFp32 / :28-34 LayerNorm).
  * GELU is the exact erf form (torch nn.GELU default); QuickGELU is
    x * sigmoid(1.702 x) (transformer.py:37-40).
  * Attention is pre-LN with packed-QKV projection equivalent to
    torch.nn.MultiheadAttention (transformer.py:200-272).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from vitlens_tpu.ops.attention import dot_product_attention
from vitlens_tpu.ops.fused_ln_proj import (
    fused_ln_proj_applicable,
    fused_ln_proj_available,
    fused_ln_qkv,
)
from vitlens_tpu.ops.fused_mlp import (
    fused_mlp_applicable,
    fused_mlp_available,
    fused_mlp_block,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def _normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype=dtype)


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init, adapted to [in, out] layout."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def _bias_uniform(key, fan_in, out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out,), dtype=dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 compute, cast back to input dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    p: Params = {"w": _kaiming_uniform(kw, (d_in, d_out))}
    if bias:
        p["b"] = _bias_uniform(kb, d_in, d_out)
    return p


def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized serving path (quant.py)
        from vitlens_tpu.quant import int8_matmul

        return int8_matmul(x, p["w_q"], p["w_s"], p.get("b"))
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI QuickGELU (reference transformer.py:37-40)."""
    return x * jax.nn.sigmoid(1.702 * x)


def get_act(quick: bool) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return quick_gelu if quick else gelu


# ---------------------------------------------------------------------------
# multi-head self-attention (torch MultiheadAttention equivalent)
# ---------------------------------------------------------------------------


def mha_init(key, dim: int) -> Params:
    """Packed-QKV MHA params. Layouts: qkv_w [dim, 3*dim], out_w [dim, dim]."""
    k1, k2, k3 = jax.random.split(key, 3)
    # torch MHA xavier_uniform_'s the PACKED [3*dim, dim] in_proj weight:
    # fan_in=dim, fan_out=3*dim -> bound = sqrt(6/(4*dim)), not the
    # per-head sqrt(6/(2*dim)) (which over-scales init std by sqrt(2))
    bound = math.sqrt(6.0 / (dim + 3 * dim))
    qkv_w = jax.random.uniform(k1, (dim, 3 * dim), minval=-bound, maxval=bound)
    return {
        "qkv_w": qkv_w,
        "qkv_b": jnp.zeros((3 * dim,)),
        "out_w": _kaiming_uniform(k2, (dim, dim)),
        "out_b": jnp.zeros((dim,)),
    }


def mha(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention on [B, N, D] with packed qkv."""
    if "qkv_w_q" in p:  # int8-quantized serving path (quant.py)
        from vitlens_tpu.quant import int8_matmul

        qkv = int8_matmul(x, p["qkv_w_q"], p["qkv_w_s"], p["qkv_b"])
    else:
        qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    return _attn_from_qkv(qkv, p, heads, mask)


def _attn_from_qkv(
    qkv: jnp.ndarray,
    p: Params,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention + out-projection given the packed [B, N, 3D] projection."""
    B, N, D3 = qkv.shape
    D = D3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = D // heads

    def split_heads(t):
        return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

    o = dot_product_attention(
        split_heads(q), split_heads(k), split_heads(v), mask=mask
    )
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    if "out_w_q" in p:  # int8-quantized serving path (quant.py)
        from vitlens_tpu.quant import int8_matmul

        return int8_matmul(o, p["out_w_q"], p["out_w_s"], p["out_b"])
    return o @ p["out_w"].astype(qkv.dtype) + p["out_b"].astype(qkv.dtype)


# ---------------------------------------------------------------------------
# residual attention block + stacked transformer
# ---------------------------------------------------------------------------


def resblock_init(key, dim: int, mlp_ratio: float = 4.0,
                  ls_init_value: Optional[float] = None) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    p: Params = {
        "ln_1": layer_norm_init(dim),
        "attn": mha_init(k1, dim),
        "ln_2": layer_norm_init(dim),
        "mlp": {
            "fc": linear_init(k2, dim, hidden),
            "proj": linear_init(k3, hidden, dim),
        },
    }
    if ls_init_value is not None:
        p["ls_1"] = {"gamma": ls_init_value * jnp.ones((dim,))}
        p["ls_2"] = {"gamma": ls_init_value * jnp.ones((dim,))}
    return p


def resblock(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    act: Callable,
    mask: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-5,
) -> jnp.ndarray:
    """Pre-LN residual attention block (reference transformer.py:253-272)."""
    # TPU hot path, front half: ln_1 + the packed-qkv projection run as one
    # Pallas kernel with Wqkv VMEM-resident (ops/fused_ln_proj.py; measured
    # 1.07x over the XLA schedule at the ViT-L encode shape).
    if ("qkv_w" in p["attn"] and fused_ln_proj_available()
            and fused_ln_proj_applicable(x, p["attn"]["qkv_w"])):
        a = _attn_from_qkv(fused_ln_qkv(x, p["ln_1"], p["attn"], ln_eps),
                           p["attn"], heads, mask)
    else:
        a = mha(layer_norm(x, p["ln_1"], ln_eps), p["attn"], heads, mask)
    if "ls_1" in p:
        a = a * p["ls_1"]["gamma"].astype(x.dtype)
    x = x + a
    # TPU hot path: the whole ln_2+fc+act+proj+residual half runs as one
    # Pallas kernel with VMEM-resident weights (ops/fused_mlp.py; measured
    # 1.23x over the XLA schedule at the ViT-L encode shape).
    act_name = ("gelu" if act is gelu
                else "quick_gelu" if act is quick_gelu else None)
    if (act_name is not None and "w" in p["mlp"]["fc"]
            and fused_mlp_available() and fused_mlp_applicable(x, p, act_name)):
        return fused_mlp_block(x, p, act_name, ln_eps)
    h = linear(layer_norm(x, p["ln_2"], ln_eps), p["mlp"]["fc"])
    h = linear(act(h), p["mlp"]["proj"])
    if "ls_2" in p:
        h = h * p["ls_2"]["gamma"].astype(x.dtype)
    return x + h


def transformer_init(key, dim: int, layers: int, mlp_ratio: float = 4.0,
                     ls_init_value: Optional[float] = None) -> Params:
    """Stacked layer params: every leaf gains a leading [layers] axis so the
    forward pass is one `lax.scan` (fast compile, XLA-friendly)."""
    keys = jax.random.split(key, layers)
    per_layer = [resblock_init(k, dim, mlp_ratio, ls_init_value) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    return {"blocks": stacked}


# Optional per-block activation hook, set at trace time by
# parallel/sp.py::sequence_sharded_activations: a with_sharding_constraint
# that keeps the [B, N, D] carry sequence-sharded over the `model` mesh axis
# between blocks (Megatron-style sequence parallelism). None = identity.
_ACTIVATION_CONSTRAINT: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None


def set_activation_constraint(
    fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]],
) -> None:
    global _ACTIVATION_CONSTRAINT
    _ACTIVATION_CONSTRAINT = fn


# Optional trace-time trunk pipelining, set by
# parallel/pp.py::pipelined_trunks: a (mesh, n_microbatches) pair. Any
# transformer() whose depth divides the pipe axis and whose batch divides
# the microbatch count is dispatched to the GPipe schedule; others fall
# back to the plain scan (e.g. a 2-layer text trunk under 4 stages).
_TRUNK_PIPELINE = None


def set_trunk_pipeline(cfg) -> None:
    global _TRUNK_PIPELINE
    _TRUNK_PIPELINE = cfg


def transformer(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    act: Callable,
    mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    skip_first_n: Optional[int] = None,
    ln_eps: float = 1e-5,
) -> jnp.ndarray:
    """Run the stacked residual blocks with lax.scan.

    `skip_first_n` drops the first N layers (reference factory.py:348-360
    skip_trans_first_n_layers, used by the vitlensG/OpenShape recipe)."""
    blocks = p["blocks"]
    if skip_first_n:
        blocks = jax.tree.map(lambda t: t[skip_first_n:], blocks)

    if _TRUNK_PIPELINE is not None:
        mesh, n_mb = _TRUNK_PIPELINE
        from vitlens_tpu.parallel.mesh import DATA_AXIS
        from vitlens_tpu.parallel.pp import PIPE_AXIS, pipeline_transformer

        n_stages = mesh.shape[PIPE_AXIS]
        n_data = mesh.shape.get(DATA_AXIS, 1)
        depth = jax.tree.leaves(blocks)[0].shape[0]
        if (depth % n_stages == 0 and x.shape[0] % n_mb == 0
                and (x.shape[0] // n_mb) % n_data == 0):
            return pipeline_transformer(
                x, {"blocks": blocks}, heads, act, mask, mesh=mesh,
                n_microbatches=n_mb, remat=bool(remat), ln_eps=ln_eps)

    def body(carry, layer_p):
        if _ACTIVATION_CONSTRAINT is not None:
            carry = _ACTIVATION_CONSTRAINT(carry)
        y = resblock(carry, layer_p, heads, act, mask, ln_eps)
        return y, None

    if remat:
        # remat may carry a variant tag: "dots" uses the dots-saveable
        # policy — matmul outputs (qkv/out/mlp, the FLOPs) are stored and
        # only the cheap elementwise/LN/softmax work is recomputed (more HBM
        # than full remat, less recompute); "nocse" disables the CSE guard,
        # which is safe and recommended inside a lax.scan body.
        tag = str(remat)
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if "dots" in tag else None)
        body = jax.checkpoint(body, policy=policy,
                              prevent_cse="nocse" not in tag)
    out, _ = jax.lax.scan(body, x, blocks)
    return out
