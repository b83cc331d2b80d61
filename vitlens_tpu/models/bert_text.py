"""TPU-native HF-style (BERT-family) text tower.

Functional JAX rebuild of the reference HFTextEncoder
(/root/reference/vitlens/src/open_clip/hf_model.py:107-231): a BERT/RoBERTa
encoder + pooler (mean_pooler / max_pooler / cls_pooler /
cls_last_hidden_state_pooler, hf_model.py:46-104) + linear-or-MLP projection
to embed_dim (hf_model.py:167-180). The reference wraps `transformers`
AutoModel and so runs on host CPU; this module runs the same math as a
jittable JAX function on the TPU, with `convert_hf_bert_state_dict` mapping
transformers BertModel weights onto the pytree. models/hf_text.py keeps the
host-side torch wrapper for arbitrary HF architectures; this covers the
BERT family natively.

Semantics (transformers BertModel, post-LN):
  emb = LN(word[ids] + pos[0..N) + token_type[0])            eps 1e-12
  per layer: h = LN(h + proj(attn(h)));  h = LN(h + W2 gelu(W1 h))
  attention_mask: additive -inf on padded keys.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.models.layers import gelu, layer_norm, layer_norm_init, linear

Params = Dict[str, Any]

LN_EPS = 1e-12      # BertConfig.layer_norm_eps default
LN_EPS_ROBERTA = 1e-5  # RobertaConfig/XLMRobertaConfig.layer_norm_eps


def _init_linear(key, d_in, d_out, std=0.02, bias=True) -> Params:
    p = {"w": std * jax.random.normal(key, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def bert_encoder_init(key, vocab_size: int, hidden: int, layers: int,
                      heads: int, intermediate: int,
                      max_positions: int = 512,
                      type_vocab_size: int = 2) -> Params:
    ks = jax.random.split(key, 4 + layers)
    emb = {
        "word": 0.02 * jax.random.normal(ks[0], (vocab_size, hidden)),
        "position": 0.02 * jax.random.normal(ks[1], (max_positions, hidden)),
        "token_type": 0.02 * jax.random.normal(ks[2], (type_vocab_size,
                                                       hidden)),
        "ln": layer_norm_init(hidden),
    }
    blocks = []
    for lk in ks[4:]:
        k = jax.random.split(lk, 6)
        blocks.append({
            "q": _init_linear(k[0], hidden, hidden),
            "k": _init_linear(k[1], hidden, hidden),
            "v": _init_linear(k[2], hidden, hidden),
            "attn_out": _init_linear(k[3], hidden, hidden),
            "attn_ln": layer_norm_init(hidden),
            "inter": _init_linear(k[4], hidden, intermediate),
            "out": _init_linear(k[5], intermediate, hidden),
            "out_ln": layer_norm_init(hidden),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return {"embeddings": emb, "blocks": stacked,
            "pooler": _init_linear(ks[3], hidden, hidden)}


def bert_encoder_apply(p: Params, input_ids: jnp.ndarray,
                       attention_mask: Optional[jnp.ndarray],
                       heads: int, position_style: str = "bert",
                       pad_id: int = 0,
                       compute_dtype=jnp.float32,
                       remat: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """input_ids [B, N] int32, attention_mask [B, N] (1=real, 0=pad).
    Returns (last_hidden_state [B, N, H], pooler_output [B, H]).

    position_style: "bert" uses absolute positions 0..N; "roberta"
    (RoBERTa/XLM-R, transformers modeling_roberta.py
    create_position_ids_from_input_ids) derives them from the pad mask —
    non-pad token i gets position padding_idx + cumsum(mask)[i], pads get
    padding_idx (= pad_id, 1 for the HF roberta family)."""
    B, N = input_ids.shape
    # the two supported HF families ship different LayerNorm eps defaults;
    # 1e-12 on a roberta checkpoint measurably diverges from transformers
    # for near-constant hidden rows
    eps = LN_EPS_ROBERTA if position_style == "roberta" else LN_EPS
    emb = p["embeddings"]
    if position_style == "roberta":
        not_pad = (input_ids != pad_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(not_pad, axis=1) * not_pad + pad_id
        pos = jnp.take(emb["position"], pos_ids, axis=0)
    elif position_style == "bert":
        pos = emb["position"][None, :N, :]
    else:
        raise ValueError(f"unknown position_style {position_style!r}")
    h = (jnp.take(emb["word"], input_ids, axis=0)
         + pos
         + emb["token_type"][0][None, None, :])
    h = layer_norm(h, emb["ln"], eps).astype(compute_dtype)

    if attention_mask is None:
        attention_mask = jnp.ones((B, N), jnp.int32)
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    bias = bias[:, None, None, :]  # [B, 1, 1, Nk]
    dh = h.shape[-1] // heads

    def split(t):
        return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

    def block(carry, bp):
        q, k, v = (split(linear(carry, bp[n])) for n in ("q", "k", "v"))
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(dh) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, -1)
        x = layer_norm(carry + linear(ctx, bp["attn_out"]), bp["attn_ln"],
                       eps)
        y = linear(gelu(linear(x, bp["inter"])), bp["out"])
        return layer_norm(x + y, bp["out_ln"], eps), None

    if remat:  # --grad-checkpointing, same policy as models/layers.py
        block = jax.checkpoint(block)
    h, _ = jax.lax.scan(block, h, p["blocks"])
    if p.get("pooler") is not None:
        pooled = jnp.tanh(linear(h[:, 0], p["pooler"]))
    else:
        # checkpoint had no BertPooler (add_pooling_layer=False): the
        # reference ClsPooler falls back to last_hidden[:, 0]
        # (hf_model.py:72-79); zero-filled weights would silently emit
        # all-zero features
        pooled = h[:, 0]
    return h, pooled


# ---------------------------------------------------------------------------
# Poolers + projection head (hf_model.py:46-104, :167-180)
# ---------------------------------------------------------------------------


def pool(last_hidden: jnp.ndarray, pooler_output: jnp.ndarray,
         attention_mask: jnp.ndarray, pooler_type: str) -> jnp.ndarray:
    if pooler_type == "mean_pooler":
        m = attention_mask[..., None].astype(last_hidden.dtype)
        return (last_hidden * m).sum(1) / m.sum(1)
    if pooler_type == "max_pooler":
        # NB the reference masked_fill's on `attention_mask` directly, which
        # masks the REAL tokens (hf_model.py:60-63) — replicate the paper
        # semantics (mask pads) here; max_pooler backs no released result.
        neg = jnp.where(attention_mask[..., None] > 0, last_hidden, -jnp.inf)
        return neg.max(axis=1)
    if pooler_type == "cls_pooler":
        return pooler_output  # the tanh BertPooler head
    if pooler_type == "cls_last_hidden_state_pooler":
        return last_hidden[:, 0]
    raise ValueError(f"unknown pooler_type {pooler_type!r}")


def proj_init(key, d_model: int, output_dim: int, proj: str = "linear"
              ) -> Params:
    # the kind is structural ("fc" vs "fc1"/"fc2") — no non-array leaves,
    # so the params tree stays optimizer/tree-map safe
    if proj == "linear":
        return {"fc": _init_linear(key, d_model, output_dim, bias=False)}
    hidden = (d_model + output_dim) // 2
    k1, k2 = jax.random.split(key)
    return {"fc1": _init_linear(k1, d_model, hidden, bias=False),
            "fc2": _init_linear(k2, hidden, output_dim, bias=False)}


def proj_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "fc" in p:
        return linear(x, p["fc"])
    return linear(gelu(linear(x, p["fc1"])), p["fc2"])


def bert_text_encode(params: Params, input_ids: jnp.ndarray,
                     attention_mask: Optional[jnp.ndarray], heads: int,
                     pooler_type: str = "mean_pooler",
                     position_style: str = "bert",
                     pad_id: int = 0,
                     compute_dtype=jnp.float32,
                     remat: bool = False) -> jnp.ndarray:
    """Full HFTextEncoder.forward equivalent (hf_model.py:205-224)."""
    if attention_mask is None:
        attention_mask = (input_ids != pad_id).astype(jnp.int32)
    hidden, pooled = bert_encoder_apply(params["encoder"], input_ids,
                                        attention_mask, heads,
                                        position_style, pad_id,
                                        compute_dtype, remat)
    feats = pool(hidden, pooled, attention_mask, pooler_type)
    return proj_apply(params["proj"], feats)


# ---------------------------------------------------------------------------
# text-tower surface (what tri.py dispatches to for TextArch.hf_style)
# ---------------------------------------------------------------------------


def hf_text_tower_init(key, t, embed_dim: int) -> Params:
    """Init from a TextArch with hf_style set (reference _build_text_tower
    -> HFTextEncoder(hf_model_name, output_dim, proj, pooler_type),
    model.py + hf_model.py:107-180)."""
    k_enc, k_proj = jax.random.split(key)
    return {
        "encoder": bert_encoder_init(
            k_enc, vocab_size=t.vocab_size, hidden=t.width, layers=t.layers,
            heads=t.heads, intermediate=t.hf_intermediate,
            max_positions=t.hf_max_positions,
            type_vocab_size=1 if t.hf_style == "roberta" else 2),
        "proj": proj_init(k_proj, t.width, embed_dim, proj=t.hf_proj),
    }


def hf_text_tower_apply(params: Params, text: jnp.ndarray, t,
                        compute_dtype=jnp.float32,
                        remat: bool = False) -> jnp.ndarray:
    """text [B, N] int ids (pad = t.hf_pad_id) -> [B, embed_dim]."""
    return bert_text_encode(
        params, text.astype(jnp.int32), None, heads=t.heads,
        pooler_type=t.hf_pooler_type, position_style=t.hf_style,
        pad_id=t.hf_pad_id, compute_dtype=compute_dtype,
        remat=remat)


# ---------------------------------------------------------------------------
# transformers BertModel state_dict -> pytree
# ---------------------------------------------------------------------------


def convert_hf_bert_state_dict(sd) -> Params:
    """Map a transformers BertModel/RobertaModel/XLMRobertaModel state dict
    (bare, or under the `bert.`/`roberta.`/open_clip `text.transformer.`
    prefixes) onto the pytree."""
    import numpy as np

    def _np(t):
        return t.detach().cpu().float().numpy() if hasattr(t, "detach") \
            else np.asarray(t)

    for prefix in ("bert.", "roberta.", "text.transformer."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break

    def lin(name):
        p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T, jnp.float32)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]), jnp.float32)
        return p

    def ln(name):
        return {"scale": jnp.asarray(_np(sd[f"{name}.weight"]), jnp.float32),
                "bias": jnp.asarray(_np(sd[f"{name}.bias"]), jnp.float32)}

    emb = {
        "word": jnp.asarray(
            _np(sd["embeddings.word_embeddings.weight"]), jnp.float32),
        "position": jnp.asarray(
            _np(sd["embeddings.position_embeddings.weight"]), jnp.float32),
        "token_type": jnp.asarray(
            _np(sd["embeddings.token_type_embeddings.weight"]), jnp.float32),
        "ln": ln("embeddings.LayerNorm"),
    }
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.layer."))
    blocks = []
    for i in range(n_layers):
        pre = f"encoder.layer.{i}"
        blocks.append({
            "q": lin(f"{pre}.attention.self.query"),
            "k": lin(f"{pre}.attention.self.key"),
            "v": lin(f"{pre}.attention.self.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "inter": lin(f"{pre}.intermediate.dense"),
            "out": lin(f"{pre}.output.dense"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    out: Params = {"embeddings": emb, "blocks": stacked}
    if "pooler.dense.weight" in sd:
        out["pooler"] = lin("pooler.dense")
    else:
        # no pooler in the checkpoint: None makes the apply fall back to
        # last_hidden[:, 0] (reference ClsPooler semantics)
        out["pooler"] = None
    return out
