"""CLIP text tower.

Mirrors reference TextTransformer (transformer.py:795-930) without the
optional cls_emb (unused by any released ViT-Lens model): token embedding +
positional embedding -> causal transformer -> ln_final -> EOT pooling
(argmax of token ids — EOT is the highest id in CLIP BPE) -> @ text_projection.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TextArch
from vitlens_tpu.models import layers as L
from vitlens_tpu.ops.attention import causal_mask

Params = Dict[str, Any]


def text_tower_init(key, cfg: TextArch, embed_dim: int) -> Params:
    k_tok, k_pos, k_trunk, k_proj = jax.random.split(key, 4)
    width = cfg.width
    return {
        "token_embedding": 0.02 * jax.random.normal(k_tok, (cfg.vocab_size, width)),
        "positional_embedding": 0.01 * jax.random.normal(
            k_pos, (cfg.context_length, width)
        ),
        "trunk": L.transformer_init(k_trunk, width, cfg.layers, 4.0, cfg.ls_init_value),
        "ln_final": L.layer_norm_init(width),
        "text_projection": (width ** -0.5)
        * jax.random.normal(k_proj, (width, embed_dim)),
    }


def text_tower_apply(
    p: Params,
    text: jnp.ndarray,
    cfg: TextArch,
    *,
    quick_gelu: bool = False,
    remat: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """text: [B, context_length] int32 token ids -> [B, embed_dim]."""
    if "lora" in p:
        # LoRA-adapted text tower (train/lora.py; same merge-at-apply
        # contract as models/vit.py)
        from vitlens_tpu.train.lora import merge_lora

        p = merge_lora(p)
    x = jnp.take(p["token_embedding"], text, axis=0).astype(compute_dtype)
    x = x + p["positional_embedding"].astype(compute_dtype)
    mask = causal_mask(cfg.context_length)
    x = L.transformer(
        x, p["trunk"], cfg.heads, L.get_act(quick_gelu), mask=mask, remat=remat
    )
    x = L.layer_norm(x, p["ln_final"])
    eot = jnp.argmax(text, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ p["text_projection"].astype(pooled.dtype)
