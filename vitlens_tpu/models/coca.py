"""CoCa: contrastive + captioning model (open_clip-compat component).

Mirrors /root/reference/vitlens/src/open_clip/coca_model.py:79-173 and the
pieces it uses from transformer.py:
  * AttentionalPooler (:173-198): learned queries cross-attend the vision
    tokens (torch MHA with kdim/vdim = context dim).
  * TextTransformer with embed_cls (:795-930): CLS appended at the END of
    the sequence, additive causal+pad mask, pooled = last position.
  * MultimodalTransformer (:933-1034): per-layer [causal self-attn block ->
    cross-attn block (ln_1_kv on image tokens)] -> ln_final -> projection to
    the vocabulary.

Kept for inventory parity with open_clip (no ViT-Lens result uses CoCa).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TextArch, TowerConfig, VisionArch
from vitlens_tpu.models import layers as L
from vitlens_tpu.ops.attention import causal_mask, dot_product_attention

Params = Dict[str, Any]


@dataclass(frozen=True)
class MultimodalArch:
    """multimodal_cfg (coca_model.py:36-44): decoder depth etc."""

    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 76
    mlp_ratio: float = 4.0


# ---------------------------------------------------------------------------
# attentional pooler
# ---------------------------------------------------------------------------


def attentional_pooler_init(key, d_model: int, context_dim: int,
                            n_queries: int = 256) -> Params:
    k_q, k_attn = jax.random.split(key)
    p = {
        "query": jax.random.normal(k_q, (n_queries, d_model)),
        "ln_q": L.layer_norm_init(d_model),
        "ln_k": L.layer_norm_init(context_dim),
        # torch MHA with kdim/vdim: separate q/k/v projections
        "q_w": L._kaiming_uniform(k_attn, (d_model, d_model)),
        "k_w": L._kaiming_uniform(jax.random.fold_in(k_attn, 1),
                                  (context_dim, d_model)),
        "v_w": L._kaiming_uniform(jax.random.fold_in(k_attn, 2),
                                  (context_dim, d_model)),
        "qkv_b": jnp.zeros((3 * d_model,)),
        "out_w": L._kaiming_uniform(jax.random.fold_in(k_attn, 3),
                                    (d_model, d_model)),
        "out_b": jnp.zeros((d_model,)),
    }
    return p


def attentional_pooler_apply(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """x [B, N, context_dim] -> [B, n_queries, d_model]."""
    B = x.shape[0]
    d_model = p["query"].shape[-1]
    k_in = L.layer_norm(x, p["ln_k"])
    q_in = L.layer_norm(p["query"].astype(x.dtype)[None], p["ln_q"])
    qb, kb, vb = jnp.split(p["qkv_b"].astype(x.dtype), 3)
    q = q_in @ p["q_w"].astype(x.dtype) + qb
    k = k_in @ p["k_w"].astype(x.dtype) + kb
    v = k_in @ p["v_w"].astype(x.dtype) + vb
    nq, nk = q.shape[1], k.shape[1]
    dh = d_model // heads

    def sh(t, n, b):
        return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    o = dot_product_attention(
        jnp.broadcast_to(sh(q, nq, 1), (B, heads, nq, dh)),
        sh(k, nk, B), sh(v, nk, B),
    )
    o = o.transpose(0, 2, 1, 3).reshape(B, nq, d_model)
    return o @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# text tower with embed_cls
# ---------------------------------------------------------------------------


def cls_text_tower_init(key, cfg: TextArch, embed_dim: int) -> Params:
    from vitlens_tpu.models.text import text_tower_init

    p = text_tower_init(key, cfg, embed_dim)
    p["cls_emb"] = 0.01 * jax.random.normal(
        jax.random.fold_in(key, 99), (cfg.width,))
    # embed_cls extends positions by one (num_pos = context_length + 1)
    p["positional_embedding"] = jnp.concatenate(
        [p["positional_embedding"],
         0.01 * jax.random.normal(jax.random.fold_in(key, 98),
                                  (1, cfg.width))], axis=0)
    return p


def cls_text_tower_apply(
    p: Params, text: jnp.ndarray, cfg: TextArch, *,
    pad_id: int = 0, quick_gelu: bool = False, compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pooled [B, E], token_embs [B, T, width]).

    Reference TextTransformer.forward with cls_emb (transformer.py:898-930):
    CLS appended at the end, causal mask + pad cls_mask, pooled = last pos
    ln_final'd then projected; tokens are the non-CLS positions."""
    B, T = text.shape
    x = jnp.take(p["token_embedding"], text, axis=0).astype(compute_dtype)
    cls = jnp.broadcast_to(p["cls_emb"].astype(x.dtype)[None, None, :],
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([x, cls], axis=1)  # [B, T+1, W]
    seq = T + 1
    x = x + p["positional_embedding"][:seq].astype(x.dtype)

    # additive mask: causal + pad (build_cls_mask, transformer.py:879-889)
    cmask = causal_mask(seq)
    valid = text != pad_id  # [B, T]
    valid = jnp.concatenate([valid, jnp.ones((B, 1), bool)], axis=1)
    pad_mask = jnp.where(valid[:, None, None, :], 0.0, -jnp.inf)
    mask = cmask[None, None] + pad_mask

    x = L.transformer(x, p["trunk"], cfg.heads, L.get_act(quick_gelu),
                      mask=mask)
    pooled, tokens = x[:, -1], x[:, :-1]
    pooled = L.layer_norm(pooled, p["ln_final"])
    pooled = pooled @ p["text_projection"].astype(pooled.dtype)
    return pooled, tokens


# ---------------------------------------------------------------------------
# multimodal decoder
# ---------------------------------------------------------------------------


def multimodal_decoder_init(key, cfg: MultimodalArch, vocab_size: int) -> Params:
    k_sa, k_ca, k_proj = jax.random.split(key, 3)
    sa = L.transformer_init(k_sa, cfg.width, cfg.layers, cfg.mlp_ratio)
    # cross blocks: resblock + ln_1_kv
    keys = jax.random.split(k_ca, cfg.layers)
    cross = [L.resblock_init(k, cfg.width, cfg.mlp_ratio) for k in keys]
    for blk in cross:
        blk["ln_1_kv"] = L.layer_norm_init(cfg.width)
    stacked_cross = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *cross)
    return {
        "resblocks": sa,
        "cross_attn": {"blocks": stacked_cross},
        "ln_final": L.layer_norm_init(cfg.width),
        "text_projection": (cfg.width ** -0.5)
        * jax.random.normal(k_proj, (cfg.width, vocab_size)),
    }


def _cross_attention(x, context, p, heads):
    """Cross-attn resblock (transformer.py:253-272 with k_x/v_x)."""
    B, Nq, D = x.shape
    Nk = context.shape[1]
    q_in = L.layer_norm(x, p["ln_1"])
    kv_in = L.layer_norm(context, p["ln_1_kv"])
    qkv_w = p["attn"]["qkv_w"].astype(x.dtype)
    qb, kb, vb = jnp.split(p["attn"]["qkv_b"].astype(x.dtype), 3)
    wq, wk, wv = jnp.split(qkv_w, 3, axis=1)
    q = q_in @ wq + qb
    k = kv_in @ wk + kb
    v = kv_in @ wv + vb
    dh = D // heads

    def sh(t, n):
        return t.reshape(B, n, heads, dh).transpose(0, 2, 1, 3)

    o = dot_product_attention(sh(q, Nq), sh(k, Nk), sh(v, Nk))
    o = o.transpose(0, 2, 1, 3).reshape(B, Nq, D)
    o = o @ p["attn"]["out_w"].astype(x.dtype) + p["attn"]["out_b"].astype(x.dtype)
    x = x + o
    h = L.linear(L.layer_norm(x, p["ln_2"]), p["mlp"]["fc"])
    h = L.linear(L.gelu(h), p["mlp"]["proj"])
    return x + h


def multimodal_decoder_apply(
    p: Params, image_embs: jnp.ndarray, text_embs: jnp.ndarray,
    cfg: MultimodalArch, *, quick_gelu: bool = False,
) -> jnp.ndarray:
    """(image tokens [B, Ni, W], text tokens [B, T, W]) -> vocab logits
    [B, T, vocab] (reference MultimodalTransformer.forward :1003-1030)."""
    seq = text_embs.shape[1]
    mask = causal_mask(cfg.context_length)[:seq, :seq]
    x = text_embs
    n_layers = cfg.layers
    sa_blocks = p["resblocks"]["blocks"]
    ca_blocks = p["cross_attn"]["blocks"]
    for i in range(n_layers):
        sa_p = jax.tree.map(lambda t: t[i], sa_blocks)
        ca_p = jax.tree.map(lambda t: t[i], ca_blocks)
        x = L.resblock(x, sa_p, cfg.heads, L.get_act(quick_gelu), mask=mask)
        x = _cross_attention(x, image_embs, ca_p, cfg.heads)
    x = L.layer_norm(x, p["ln_final"])
    return x @ p["text_projection"].astype(x.dtype)


# ---------------------------------------------------------------------------
# CoCa composition
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CoCaConfig:
    embed_dim: int = 512
    vision: VisionArch = VisionArch()
    text: TextArch = TextArch()
    multimodal: MultimodalArch = MultimodalArch()
    n_queries: int = 256  # attn pooler queries (+1 contrastive query row)
    attn_pooler_heads: int = 8  # reference CLIPVisionCfg.attn_pooler_heads
    pad_id: int = 0
    caption_loss_weight: float = 2.0
    contrastive_loss_weight: float = 1.0


def coca_init(key, cfg: CoCaConfig) -> Tuple[Params, Params]:
    from vitlens_tpu.models.vit import vision_tower_init

    k_v, k_t, k_d, k_p = jax.random.split(key, 4)
    tower = TowerConfig(arch=cfg.vision, embed_dim=cfg.embed_dim,
                        modality="image")
    vis_p, vis_s = vision_tower_init(k_v, tower)
    # CoCa vision tower uses attentional pooling (n_queries + 1)
    vis_p["attn_pool"] = attentional_pooler_init(
        k_p, cfg.embed_dim, cfg.vision.width, cfg.n_queries + 1)
    vis_p["ln_post"] = L.layer_norm_init(cfg.embed_dim)
    vis_p["proj"] = (cfg.embed_dim ** -0.5) * jax.random.normal(
        jax.random.fold_in(k_p, 1), (cfg.embed_dim, cfg.embed_dim))
    params = {
        "visual": vis_p,
        "text": cls_text_tower_init(k_t, cfg.text, cfg.embed_dim),
        "text_decoder": multimodal_decoder_init(k_d, cfg.multimodal,
                                                cfg.text.vocab_size),
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), jnp.float32),
    }
    return params, {"visual": vis_s}


def coca_encode_image(params, images, cfg: CoCaConfig,
                      compute_dtype=jnp.float32):
    """Returns (latent [B, E], token embeds [B, n_queries, E]) following the
    reference attentional-pool vision path (transformer.py:778-787)."""
    from vitlens_tpu.adapters.tokenizers import patch_embed

    p = params["visual"]
    x = images.astype(compute_dtype)
    tokens = patch_embed(x, p["adapter"]["conv1"], cfg.vision.patch_size)
    B = tokens.shape[0]
    cls = jnp.broadcast_to(p["class_embedding"].astype(tokens.dtype)[None, None],
                           (B, 1, tokens.shape[-1]))
    h = jnp.concatenate([cls, tokens], axis=1)
    h = h + p["positional_embedding"].astype(h.dtype)
    h = L.layer_norm(h, p["ln_pre"])
    h = L.transformer(h, p["trunk"], cfg.vision.heads, L.gelu)
    h = attentional_pooler_apply(p["attn_pool"], h, heads=cfg.attn_pooler_heads)
    h = L.layer_norm(h, p["ln_post"])
    latent, tokens_out = h[:, 0], h[:, 1:]
    latent = latent @ p["proj"].astype(latent.dtype)
    return latent, tokens_out


def coca_forward(params, state, images, text, cfg: CoCaConfig,
                 compute_dtype=jnp.float32):
    """Reference CoCa.forward (coca_model.py:158-173)."""
    # make space for CLS: decode positions are text[:, :-1]
    text_in = text[:, :-1]
    text_latent, token_embs = cls_text_tower_apply(
        params["text"], text_in, cfg.text, pad_id=cfg.pad_id,
        compute_dtype=compute_dtype)
    image_latent, image_embs = coca_encode_image(params, images, cfg,
                                                  compute_dtype)
    labels = text[:, -token_embs.shape[1]:]
    logits = multimodal_decoder_apply(
        params["text_decoder"], image_embs, token_embs, cfg.multimodal)

    def n(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v.astype(jnp.float32), axis=-1, keepdims=True),
            1e-12).astype(v.dtype)

    return {
        "image_features": n(image_latent),
        "text_features": n(text_latent),
        "logits": logits,
        "labels": labels,
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def coca_loss(out, cfg: CoCaConfig, axis_name=None):
    """CoCaLoss (loss.py:168-231): contrastive + weighted caption CE."""
    from vitlens_tpu.train.losses import caption_loss, clip_loss

    contrastive = cfg.contrastive_loss_weight * clip_loss(
        out["image_features"], out["text_features"], out["logit_scale"],
        axis_name=axis_name)
    caption = caption_loss(out["logits"], out["labels"], pad_id=cfg.pad_id,
                           weight=cfg.caption_loss_weight)
    return contrastive, caption


def coca_generate_greedy(params, state, images, cfg: CoCaConfig,
                         sot_token: int, eot_token: int, seq_len: int = 20):
    """Minimal greedy decoding (reference generate(), coca_model.py:175+,
    supports beam search — greedy here covers the API surface)."""
    B = images.shape[0]
    image_latent, image_embs = coca_encode_image(params, images, cfg)
    out = jnp.full((B, 1), sot_token, jnp.int32)
    for _ in range(seq_len):
        _, token_embs = cls_text_tower_apply(
            params["text"], out, cfg.text, pad_id=cfg.pad_id)
        logits = multimodal_decoder_apply(
            params["text_decoder"], image_embs, token_embs, cfg.multimodal)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out = jnp.concatenate([out, nxt[:, None]], axis=1)
    return out
