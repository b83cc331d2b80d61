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

import functools
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


def coca_cls_attn_mask(text: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """Causal + cls pad mask for the CLS-extended text tower, exactly the
    reference build_cls_mask (transformer.py:879-889): F.pad puts one
    leading True on the KEY axis and T leading all-True rows on the QUERY
    axis, so only the LAST query row (CLS) is pad-masked, with key j
    attendable iff j == 0 or text[j-1] != pad — CLS attends the first pad
    position and NOT itself when text[-1] is pad. Non-CLS rows get no pad
    mask (harmless under causality: non-pad queries precede every pad
    key). Returns additive [B, 1, T+1, T+1]."""
    B, T = text.shape
    seq = T + 1
    cmask = causal_mask(seq)
    valid = jnp.concatenate(
        [jnp.ones((B, 1), bool), text != pad_id], axis=1)  # keys, shifted
    row = jnp.arange(seq)[None, :, None]  # [1, Tq, 1]
    cls_pad = jnp.where((row == seq - 1) & ~valid[:, None, :],
                        -jnp.inf, 0.0)  # [B, Tq, Tk]
    return cmask[None, None] + cls_pad[:, None]


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

    mask = coca_cls_attn_mask(text, pad_id)

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


def make_coca_config(name: str) -> CoCaConfig:
    """Named presets transcribed from the reference model_configs
    (coca_ViT-B-32.json / coca_ViT-L-14.json)."""
    if name == "coca_ViT-B-32":
        return CoCaConfig(
            embed_dim=512,
            vision=VisionArch(image_size=224, patch_size=32, width=768,
                              layers=12),
            text=TextArch(context_length=76, width=512, heads=8, layers=12),
            multimodal=MultimodalArch(context_length=76, width=512, heads=8,
                                      layers=12),
            attn_pooler_heads=8,
        )
    if name == "coca_ViT-L-14":
        return CoCaConfig(
            embed_dim=768,
            vision=VisionArch(image_size=224, patch_size=14, width=1024,
                              layers=24),
            text=TextArch(context_length=76, width=768, heads=12, layers=12),
            multimodal=MultimodalArch(context_length=76, width=768, heads=12,
                                      layers=12),
            attn_pooler_heads=8,
        )
    raise KeyError(f"unknown coca config {name!r}")


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
    """Minimal greedy decoding (reference generate(), coca_model.py:175+).
    Full sampling/beam decoding lives in `coca_generate` below."""
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


# ---------------------------------------------------------------------------
# full generate: sampling (top_p / top_k) + grouped beam search
# ---------------------------------------------------------------------------
#
# TPU-native re-design of the reference generate()/_generate_beamsearch
# (coca_model.py:175-491, built on HuggingFace GenerationMixin pieces): the
# torch version grows `out` one column per python-loop step (dynamic shapes).
# Here every sequence lives in a fixed [_, seq_len] buffer and decoding is a
# single `lax.scan` — one compiled step, static shapes, no retraces. Reading
# the logits at the current position is exact because the decoder is causal:
# garbage beyond `pos` cannot influence position `pos`.
#
# Semantics notes (intentional, documented divergences):
#  * the reference's beam search accumulates RAW decoder logits (it skips
#    HF's log_softmax) — we match that.
#  * reference `num_beam_groups` uses no diversity logits processor, so its
#    groups run identical searches; we implement groups as independent
#    width-(num_beams/num_beam_groups) searches and take the best across
#    groups, which is the same computation without the redundancy.
#  * finalization follows the t5x convention: a batch entry returns its best
#    finished hypothesis if any beam finished, else its best live beam (the
#    HF scorer additionally tops up with live beams when fewer than
#    num_beams hypotheses finished; with num_beam_hyps_to_keep=1 the
#    returned sequence only differs in pathological no-finish cases).
#  * output is always a fixed [B, seq_len] buffer padded with pad_id after
#    EOS (the reference's fixed_output_length=True); pass
#    fixed_output_length=False to trim trailing all-pad columns on host.


def _decode_pos_logits(params, image_embs, tokens, pos, cfg: CoCaConfig,
                       compute_dtype=jnp.float32):
    """Decode a padded [N, L] buffer and return vocab logits at `pos` [N, V]."""
    _, token_embs = cls_text_tower_apply(
        params["text"], tokens, cfg.text, pad_id=cfg.pad_id,
        compute_dtype=compute_dtype)
    logits = multimodal_decoder_apply(
        params["text_decoder"], image_embs, token_embs, cfg.multimodal)
    return jax.lax.dynamic_slice_in_dim(logits, pos, 1, axis=1)[:, 0]


def _min_length_mask(scores, cur_len, min_seq_len, eos_id):
    """HF MinLengthLogitsProcessor: EOS impossible before min_seq_len."""
    neg = jnp.full_like(scores[:, eos_id], -jnp.inf)
    return scores.at[:, eos_id].set(
        jnp.where(cur_len < min_seq_len, neg, scores[:, eos_id]))


def _repetition_penalty(scores, tokens, valid, penalty):
    """HF RepetitionPenaltyLogitsProcessor over a fixed buffer: for every
    token already in the (valid part of the) prefix, positive scores divide
    by `penalty`, negative multiply. Scatter of equal values per duplicate
    index, so duplicate prefix tokens are safe."""
    if penalty == 1.0:
        return scores
    rows = jnp.arange(scores.shape[0])[:, None]
    seen = jnp.zeros(scores.shape, bool).at[rows, tokens].max(valid)
    pen = jnp.where(scores > 0, scores / penalty, scores * penalty)
    return jnp.where(seen, pen, scores)


def _top_k_warp(scores, top_k: int):
    """HF TopKLogitsWarper: everything below the k-th largest -> -inf."""
    kth = jax.lax.top_k(scores, top_k)[0][:, -1:]
    return jnp.where(scores < kth, -jnp.inf, scores)


def _top_p_warp(scores, top_p: float):
    """HF TopPLogitsWarper: drop a token when the probability mass of
    strictly-higher-ranked tokens already covers top_p (rank 0 always
    kept)."""
    order = jnp.argsort(-scores, axis=-1)
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    probs = jax.nn.softmax(sorted_scores, axis=-1)
    mass_before = jnp.cumsum(probs, axis=-1) - probs
    remove = mass_before >= top_p
    remove = remove.at[:, 0].set(False)
    warped = jnp.where(remove, -jnp.inf, sorted_scores)
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(warped, inv, axis=-1)


def _generate_sample(params, image_embs, key, cfg: CoCaConfig, *, B, seq_len,
                     temperature, warper, min_seq_len, repetition_penalty,
                     sot_id, eos_id, pad_id, compute_dtype):
    """Sampling loop (reference generate() while-loop, coca_model.py:268-317):
    finished rows append pad; the final position is forced to EOS."""
    out0 = jnp.full((B, seq_len), pad_id, jnp.int32).at[:, 0].set(sot_id)

    def step(carry, pos):
        out, k = carry
        k, k_s = jax.random.split(k)
        logits = _decode_pos_logits(params, image_embs, out, pos - 1, cfg,
                                    compute_dtype).astype(jnp.float32)
        last = jax.lax.dynamic_slice_in_dim(out, pos - 1, 1, axis=1)[:, 0]
        finished = (last == eos_id) | ((last == pad_id) & (pos > 1))
        valid = jnp.arange(seq_len)[None, :] < pos
        logits = _min_length_mask(logits, pos, min_seq_len, eos_id)
        logits = _repetition_penalty(logits, out, valid, repetition_penalty)
        logits = warper(logits)
        sample = jax.random.categorical(k_s, logits / temperature, axis=-1)
        sample = jnp.where(pos + 1 == seq_len, eos_id, sample)
        nxt = jnp.where(finished, pad_id, sample).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice_in_dim(out, nxt[:, None], pos,
                                                  axis=1)
        return (out, k), None

    (out, _), _ = jax.lax.scan(step, (out0, key), jnp.arange(1, seq_len))
    return out


def _generate_beam(params, image_embs, cfg: CoCaConfig, *, B, seq_len,
                   n_beams, min_seq_len, repetition_penalty, sot_id, eos_id,
                   pad_id, compute_dtype):
    """Static-shape beam search (reference _generate_beamsearch,
    coca_model.py:322-491). image_embs is already beam-expanded
    [B*S, Ni, W]. Scores accumulate raw logits (reference quirk); finished
    hypotheses are length-normalized (HF length_penalty=1.0)."""
    S = n_beams
    NEG = jnp.float32(-1e9)
    live0 = jnp.full((B, S, seq_len), pad_id, jnp.int32).at[:, :, 0].set(sot_id)
    lscore0 = jnp.full((B, S), NEG).at[:, 0].set(0.0)
    fin0 = live0
    fscore0 = jnp.full((B, S), -jnp.inf)

    def step(carry, pos):
        live, lscore, fin, fscore = carry
        logits = _decode_pos_logits(
            params, image_embs, live.reshape(B * S, seq_len), pos - 1, cfg,
            compute_dtype).astype(jnp.float32)
        valid = jnp.arange(seq_len)[None, :] < pos
        logits = _min_length_mask(logits, pos, min_seq_len, eos_id)
        logits = _repetition_penalty(
            logits, live.reshape(B * S, seq_len),
            jnp.broadcast_to(valid, (B * S, seq_len)), repetition_penalty)
        V = logits.shape[-1]
        cand = lscore[:, :, None] + logits.reshape(B, S, V)  # [B, S, V]
        # 2S candidates so S survive even if S end in EOS (HF 2*group_size)
        top_sc, top_ix = jax.lax.top_k(cand.reshape(B, S * V), 2 * S)
        src_beam, tok = top_ix // V, (top_ix % V).astype(jnp.int32)
        seqs = jnp.take_along_axis(live, src_beam[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, tok[:, :, None], pos, axis=2)  # [B, 2S, L]
        is_eos = tok == eos_id
        # finished pool: normalize by hypothesis length (= pos tokens before
        # EOS, matching HF add() on the pre-EOS input_ids)
        new_f = jnp.where(is_eos, top_sc / pos.astype(jnp.float32), -jnp.inf)
        # keep EOS out of the stored finished sequence (HF stores the prefix)
        f_seqs = jnp.where(is_eos[:, :, None],
                           jax.lax.dynamic_update_slice_in_dim(
                               seqs, jnp.full((B, 2 * S, 1), pad_id,
                                              jnp.int32), pos, axis=2),
                           seqs)
        all_f = jnp.concatenate([fscore, new_f], axis=1)       # [B, 3S]
        all_fs = jnp.concatenate([fin, f_seqs], axis=1)
        f_sc, f_ix = jax.lax.top_k(all_f, S)
        fin = jnp.take_along_axis(all_fs, f_ix[:, :, None], axis=1)
        fscore = f_sc
        # live pool: best S non-EOS candidates
        live_sc = jnp.where(is_eos, -jnp.inf, top_sc)
        l_sc, l_ix = jax.lax.top_k(live_sc, S)
        live = jnp.take_along_axis(seqs, l_ix[:, :, None], axis=1)
        lscore = jnp.maximum(l_sc, NEG)  # -inf + logit stays ordered
        return (live, lscore, fin, fscore), None

    (live, lscore, fin, fscore), _ = jax.lax.scan(
        step, (live0, lscore0, fin0, fscore0), jnp.arange(1, seq_len))
    # finalize: best finished if any beam finished, else best live
    # (normalized by full length, HF finalize on non-done hypotheses)
    any_fin = jnp.isfinite(fscore[:, 0])
    live_norm = lscore / float(seq_len)
    best_live = jnp.take_along_axis(
        live, jnp.argmax(live_norm, axis=1)[:, None, None], axis=1)[:, 0]
    best_fin = fin[:, 0]
    return jnp.where(any_fin[:, None], best_fin, best_live)


# jit caches for generate: a fresh lambda per call would retrace and
# recompile the full decode scan every invocation (jit caches by function
# identity) — tens of seconds per caption batch on TPU. All keys are
# hashable statics (cfg is a frozen dataclass).


@functools.lru_cache(maxsize=32)
def _jit_beam(cfg, B, seq_len, n_beams, min_seq_len, repetition_penalty,
              sot_id, eos_id, pad_id, compute_dtype):
    return jax.jit(lambda p, e: _generate_beam(
        p, e, cfg, B=B, seq_len=seq_len, n_beams=n_beams,
        min_seq_len=min_seq_len, repetition_penalty=repetition_penalty,
        sot_id=sot_id, eos_id=eos_id, pad_id=pad_id,
        compute_dtype=compute_dtype))


@functools.lru_cache(maxsize=32)
def _jit_sample(cfg, B, seq_len, temperature, generation_type, top_p, top_k,
                min_seq_len, repetition_penalty, sot_id, eos_id, pad_id,
                compute_dtype):
    warper = ((lambda s: _top_p_warp(s, top_p))
              if generation_type == "top_p"
              else (lambda s: _top_k_warp(s, top_k)))
    return jax.jit(lambda p, e, k: _generate_sample(
        p, e, k, cfg, B=B, seq_len=seq_len, temperature=temperature,
        warper=warper, min_seq_len=min_seq_len,
        repetition_penalty=repetition_penalty, sot_id=sot_id,
        eos_id=eos_id, pad_id=pad_id, compute_dtype=compute_dtype))


def coca_generate(params, state, images, cfg: CoCaConfig, *, key=None,
                  seq_len: int = 30, temperature: float = 1.0,
                  generation_type: str = "beam_search", top_p: float = 0.1,
                  top_k: int = 1, pad_token_id: Optional[int] = None,
                  eos_token_id: int = 49407, sot_token_id: int = 49406,
                  num_beams: int = 6, num_beam_groups: int = 3,
                  min_seq_len: int = 5, repetition_penalty: float = 1.0,
                  fixed_output_length: bool = True,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Caption generation (reference generate(), coca_model.py:175-320).

    generation_type: "beam_search" | "top_p" | "top_k". Returns int32
    [B, seq_len] (pad-filled after EOS); fixed_output_length=False trims
    trailing all-pad columns on host. `key` is required for the sampling
    modes (explicit PRNG instead of torch global state)."""
    assert seq_len > min_seq_len, "seq_len must be larger than min_seq_len"
    pad_id = cfg.pad_id if pad_token_id is None else pad_token_id
    B = images.shape[0]
    _, image_embs = coca_encode_image(params, images, cfg, compute_dtype)

    if generation_type == "beam_search":
        if num_beams % num_beam_groups:
            raise ValueError("num_beams must be divisible by num_beam_groups")
        sub = num_beams // num_beam_groups
        # groups are independent searches over the same image (see module
        # note); fold groups into the batch, pick the best group afterwards
        G = num_beam_groups
        embs = jnp.repeat(image_embs, G * sub, axis=0)  # [B*G*sub, Ni, W]
        out = _jit_beam(
            cfg, B * G, seq_len, sub, min_seq_len, repetition_penalty,
            sot_token_id, eos_token_id, pad_id, compute_dtype,
        )(params, embs)  # [B*G, L]
        out = out.reshape(B, G, seq_len)[:, 0]  # groups identical; take 0
    elif generation_type in ("top_p", "top_k"):
        if key is None:
            raise ValueError(f"{generation_type} sampling needs a PRNG key")
        out = _jit_sample(
            cfg, B, seq_len, temperature, generation_type, top_p, top_k,
            min_seq_len, repetition_penalty, sot_token_id, eos_token_id,
            pad_id, compute_dtype,
        )(params, image_embs, key)
    else:
        raise ValueError(
            "generation_type has to be one of | beam_search | top_p | top_k |")

    if not fixed_output_length:
        import numpy as np

        arr = np.asarray(out)
        used = (arr != pad_id).any(axis=0)
        last = int(np.max(np.nonzero(used)[0])) + 1 if used.any() else 1
        return jnp.asarray(arr[:, :last])
    return out
