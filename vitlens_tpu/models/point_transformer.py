"""PointTransformer: full PointBERT point-cloud classifier/encoder.

Mirrors /root/reference/vitlens/src/open_clip/modal_3d/models/pointbert/
point_encoder.py:170-295 (used by the reference pc_main dual runs):
  FPS+kNN grouping -> mini-PointNet encoder -> reduce_dim -> [CLS; tokens]
  with [cls_pos; MLP(center)] positions ADDED AT EVERY BLOCK
  (TransformerEncoder.forward: x = block(x + pos)) -> LayerNorm ->
  concat(CLS, max over tokens) [do_cat] -> @ proj.

Blocks are pre-LN with bias-free qkv (Block/Attention :16-127), i.e. the
shared resblock with qkv_b = 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import PointAdapterConfig
from vitlens_tpu.adapters import tokenizers as tok
from vitlens_tpu.models import layers as L

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclass(frozen=True)
class PointTransformerConfig:
    point: PointAdapterConfig = PointAdapterConfig()
    depth: int = 12
    num_heads: int = 6
    do_cat: bool = True
    output_dim: Optional[int] = None


def point_transformer_init(key, cfg: PointTransformerConfig) -> Tuple[Params, State]:
    pt = cfg.point
    k_tok, k_cls, k_pos, k_blocks, k_proj = jax.random.split(key, 5)
    tok_p, tok_s = tok.point_tokenizer_init(k_tok, pt)
    p: Params = {
        "tokenizer": tok_p,
        "cls_token": jnp.zeros((pt.trans_dim,)),
        "cls_pos": jax.random.normal(k_pos, (pt.trans_dim,)),
        "blocks": L.transformer_init(k_blocks, pt.trans_dim, cfg.depth),
        "norm": L.layer_norm_init(pt.trans_dim),
    }
    if cfg.output_dim is not None:
        cat = 2 if cfg.do_cat else 1
        p["proj"] = (cfg.output_dim ** -0.5) * jax.random.normal(
            k_proj, (cat * pt.trans_dim, cfg.output_dim))
    return p, {"tokenizer": tok_s}


def point_transformer_apply(
    p: Params,
    s: State,
    pts: jnp.ndarray,
    cfg: PointTransformerConfig,
    *,
    train: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, State]:
    """pts [B, N, 3] -> features [B, output_dim or (cat*trans_dim)]."""
    pts = pts.astype(compute_dtype)
    (tokens, pos), new_tok_s = tok.point_tokenizer_apply(
        p["tokenizer"], s["tokenizer"], pts, cfg.point, train,
        fps_key=fps_key, bn_axis_name=bn_axis_name,
    )
    B = tokens.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(tokens.dtype)[None, None],
                           (B, 1, tokens.shape[-1]))
    cls_pos = jnp.broadcast_to(p["cls_pos"].astype(tokens.dtype)[None, None],
                               (B, 1, tokens.shape[-1]))
    x = jnp.concatenate([cls, tokens], axis=1)
    pos_full = jnp.concatenate([cls_pos, pos], axis=1)

    def body(carry, layer_p):
        # reference TransformerEncoder: pos re-added before EVERY block
        y = L.resblock(carry + pos_full, layer_p, cfg.num_heads, L.gelu)
        return y, None

    x, _ = jax.lax.scan(body, x, p["blocks"]["blocks"])
    x = L.layer_norm(x, p["norm"])
    feat = (jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
            if cfg.do_cat else x[:, 0])
    if "proj" in p:
        feat = feat @ p["proj"].astype(feat.dtype)
    return feat, {"tokenizer": new_tok_s}


def convert_point_transformer(sd, cfg: PointTransformerConfig) -> Tuple[Params, State]:
    """torch PointTransformer state dict -> pytree."""
    from vitlens_tpu.weights.torch_convert import (
        _bn, _conv1x1, _j, _linear, _ln, _np,
    )

    bn1_p, bn1_s = _bn(sd, "encoder.first_conv.1")
    bn2_p, bn2_s = _bn(sd, "encoder.second_conv.1")
    tok_p = {
        "encoder": {
            "conv1": _conv1x1(sd, "encoder.first_conv.0"), "bn1": bn1_p,
            "conv2": _conv1x1(sd, "encoder.first_conv.3"),
            "conv3": _conv1x1(sd, "encoder.second_conv.0"), "bn2": bn2_p,
            "conv4": _conv1x1(sd, "encoder.second_conv.3"),
        },
        "reduce_dim": _linear(sd, "reduce_dim"),
        "pos_embed": {"fc1": _linear(sd, "pos_embed.0"),
                      "fc2": _linear(sd, "pos_embed.2")},
    }
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.blocks.{i}."
        qkv_w = _j(sd[f"{pre}attn.qkv.weight"]).T
        d = qkv_w.shape[0]
        qkv_b = (_j(sd[f"{pre}attn.qkv.bias"])
                 if f"{pre}attn.qkv.bias" in sd else jnp.zeros((3 * d,)))
        blocks.append({
            "ln_1": _ln(sd, f"{pre}norm1"),
            "attn": {
                "qkv_w": qkv_w, "qkv_b": qkv_b,
                "out_w": _j(sd[f"{pre}attn.proj.weight"]).T,
                "out_b": _j(sd[f"{pre}attn.proj.bias"]),
            },
            "ln_2": _ln(sd, f"{pre}norm2"),
            "mlp": {
                "fc": _linear(sd, f"{pre}mlp.fc1"),
                "proj": _linear(sd, f"{pre}mlp.fc2"),
            },
        })
    p: Params = {
        "tokenizer": tok_p,
        "cls_token": _j(sd["cls_token"]).reshape(-1),
        "cls_pos": _j(sd["cls_pos"]).reshape(-1),
        "blocks": {"blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)},
        "norm": _ln(sd, "norm"),
    }
    if "proj" in sd:
        p["proj"] = _j(sd["proj"])
    s: State = {"tokenizer": {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}}
    return p, s


def label_smoothing_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                         eps: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PointTransformer.get_loss_acc (point_encoder.py:221-238): smoothed CE
    + accuracy*100."""
    n_class = pred.shape[1]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=1)
    one_hot = jax.nn.one_hot(gt, n_class)
    smooth = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    loss = -jnp.mean(jnp.sum(smooth * logp, axis=1))
    acc = jnp.mean((jnp.argmax(pred, axis=-1) == gt).astype(jnp.float32)) * 100
    return loss, acc
