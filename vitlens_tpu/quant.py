"""Post-training int8 quantization (W8A8) for the encode/serving path.

TPU-first rationale: the v5e MXU's int8 peak is 2x bf16 (394 vs 197
TOP/s). For inference the trunk matmuls (qkv / out-proj / mlp fc / mlp
proj — all of the FLOPs) can run int8 x int8 -> int32 on the MXU with

  * per-output-channel symmetric weight scales, folded once at load time
    (`quantize_tower_params`), and
  * dynamic per-row (per-token) symmetric activation scales computed
    inline (an amax reduce + scale that XLA fuses with the producing op).

This is a serving feature with NO reference counterpart (the reference
serves fp16/fp32 torch modules); it exists because the hardware offers
the 2x. It is opt-in (`quant.quantize_model(model)` on a loaded
`ViTLens`, or `quantize_tower_params` on a raw param tree) and
inference-only: quantized params carry no gradient story, and the train
CLI never produces them. Measured e2e on this chip it LOSES (0.904x —
int8 MXU only reaches 1.43x bf16 here; see CLAUDE.md), which is why it
is a library feature and not a serving default.

Numerics: weights lose at most 1/254 of their per-channel amax to
rounding; activations are quantized per row so one outlier token cannot
crush the scale of the whole batch. Measured tower-feature fidelity vs
the bf16 path is recorded in PARITY.md (cosine, random-weight towers;
released-checkpoint fidelity needs the offline-unreachable ckpts).

Param layout: a quantized matmul replaces its float leaf `w` ([..., K, N])
with `w_q` (int8, same shape) + `w_s` (f32 [..., 1, N], keepdims so the
scan-stacked [L, 1, N] slices to a broadcastable [1, N] per layer).
`models/layers.py::linear` / `mha` dispatch on key presence, exactly like
the LoRA `"lora"` key rides the same pytree through jit/donation/sharding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_Q = 127.0


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] float -> (int8 [..., K, N], f32 scales [..., 1, N]).

    Symmetric per-output-channel: s_n = amax_k |w[..., k, n]| / 127.
    Works unchanged on scan-stacked [L, K, N] weights (the reduce is over
    axis -2 only).
    """
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / _Q
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -_Q, _Q).astype(jnp.int8)
    return q, s


def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_s: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q, w_s) with dynamic per-row activation quant.

    The activation is quantized per row (per token): one amax reduce over
    the contracted axis, then the int8 x int8 -> int32 dot rides the MXU's
    2x int8 path; the f32 row-scale x col-scale dequant is elementwise and
    fuses with the bias/residual consumer.
    """
    shp = x.shape
    k = shp[-1]
    n = w_q.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    xs = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / _Q
    xs = jnp.maximum(xs, 1e-12)
    xi = jnp.clip(jnp.round(x2 / xs), -_Q, _Q).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * w_s.reshape(1, n)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype).reshape(shp[:-1] + (n,))


def _quantize_linear(p: Params) -> Params:
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q"], out["w_s"] = quantize_weight(p["w"])
    return out


def quantize_resblocks(blocks: Params) -> Params:
    """Quantize the four trunk matmuls of (scan-stacked) resblock params.

    LN / layer-scale / biases stay float; attention score+value dots stay
    bf16 (small FLOPs, quality-sensitive). Keys follow
    models/layers.py::resblock_init.
    """
    attn = dict(blocks["attn"])
    attn["qkv_w_q"], attn["qkv_w_s"] = quantize_weight(attn.pop("qkv_w"))
    attn["out_w_q"], attn["out_w_s"] = quantize_weight(attn.pop("out_w"))
    out = dict(blocks)
    out["attn"] = attn
    out["mlp"] = {
        "fc": _quantize_linear(blocks["mlp"]["fc"]),
        "proj": _quantize_linear(blocks["mlp"]["proj"]),
    }
    return out


def quantize_tower_params(
    tower_params: Params,
    *,
    trunk_keys: Sequence[str] = ("trunk", "perceiver_transformer"),
) -> Params:
    """Quantize every transformer trunk inside one tower's param tree.

    Visual towers: `trunk` (+ `perceiver_transformer` when the
    perceiver-as-transformer ablation is active). Text towers share the
    same `trunk`/`blocks` layout (models/text.py), so this works on both.
    LoRA-adapted towers must be merged first (train/lora.py::merge_lora)
    — quantizing unmerged factors would freeze the adaptation out of the
    int8 weights; we reject that loudly.
    """
    if "lora" in tower_params:
        raise ValueError(
            "cannot quantize a LoRA-adapted tower: merge the adapters "
            "into plain weights first (ViTLens.export_params() / "
            "ViTLens.export_checkpoint(), or train/lora.py::merge_lora "
            "on the raw tower tree)")
    out = dict(tower_params)
    for key in trunk_keys:
        if key in out and isinstance(out[key], dict) and "blocks" in out[key]:
            out[key] = {
                **out[key], "blocks": quantize_resblocks(out[key]["blocks"]),
            }
    return out


def quantize_model(model, towers: Sequence[str] = ("visual",)):
    """Return a copy of a factory.TriModel with the named towers' trunks
    quantized to int8. Towers absent from the param tree are skipped
    (e.g. `text` on a visual-only bundle)."""
    import dataclasses

    params = dict(model.params)
    for t in towers:
        if t in params and isinstance(params[t], dict):
            params[t] = quantize_tower_params(params[t])
    return dataclasses.replace(model, params=params)


def is_quantized(tower_params: Params) -> bool:
    trunk = tower_params.get("trunk")
    if not isinstance(trunk, dict):
        return False
    blocks = trunk.get("blocks", {})
    return isinstance(blocks, dict) and "qkv_w_q" in blocks.get("attn", {})
