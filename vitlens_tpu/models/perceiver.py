"""Perceiver "Lens": cross-attention compressor from modality tokens to a
fixed set of latents that the frozen CLIP ViT consumes.

Semantics mirrored from the reference lucidrains-style implementation
(/root/reference/vitlens/src/open_clip/perceiver.py:157-332):
  depth x [ cross-attn(latents <- tokens) + FF + self_per_cross_attn x (self-attn + FF) ]
with PreNorm (plain LayerNorm, incl. a separate LN on the context), GEGLU
feed-forward, residuals added outside the PreNorm'd fn, and learned latents
of shape [num_latents, latent_dim].

The TPU design keeps the whole Lens as one jit region; attention uses the
shared ops.attention entry point. Dropout is omitted (all released configs
use attn/ff dropout 0.0 — mm_vit_lens/model_cfg.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vitlens_tpu.config import PerceiverConfig
from vitlens_tpu.models.layers import layer_norm, layer_norm_init, gelu
from vitlens_tpu.ops.attention import dot_product_attention

Params = Dict[str, Any]


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _attn_init(key, query_dim: int, context_dim: int, heads: int, dim_head: int) -> Params:
    """Perceiver attention params (reference perceiver.py:105-154):
    to_q/to_kv without bias, to_out with bias."""
    inner = heads * dim_head
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_q": {"w": _xavier(k1, (query_dim, inner))},
        "to_kv": {"w": _xavier(k2, (context_dim, 2 * inner))},
        "to_out": {"w": _xavier(k3, (inner, query_dim)),
                   "b": jnp.zeros((query_dim,))},
    }


def _attn(
    x: jnp.ndarray,
    context: jnp.ndarray,
    p: Params,
    heads: int,
    dim_head: int,
) -> jnp.ndarray:
    B, Nq, _ = x.shape
    Nk = context.shape[1]
    q = x @ p["to_q"]["w"].astype(x.dtype)
    kv = context @ p["to_kv"]["w"].astype(x.dtype)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t, n):
        return t.reshape(B, n, heads, dim_head).transpose(0, 2, 1, 3)

    o = dot_product_attention(
        split_heads(q, Nq), split_heads(k, Nk), split_heads(v, Nk),
        scale=dim_head ** -0.5,
    )
    o = o.transpose(0, 2, 1, 3).reshape(B, Nq, heads * dim_head)
    return o @ p["to_out"]["w"].astype(x.dtype) + p["to_out"]["b"].astype(x.dtype)


def _ff_init(key, dim: int, mult: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc": {"w": _xavier(k1, (dim, dim * mult * 2)), "b": jnp.zeros((dim * mult * 2,))},
        "proj": {"w": _xavier(k2, (dim * mult, dim)), "b": jnp.zeros((dim,))},
    }


def _ff(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """GEGLU feed-forward (reference perceiver.py:86-101)."""
    h = x @ p["fc"]["w"].astype(x.dtype) + p["fc"]["b"].astype(x.dtype)
    a, gates = jnp.split(h, 2, axis=-1)
    h = a * gelu(gates)
    return h @ p["proj"]["w"].astype(x.dtype) + p["proj"]["b"].astype(x.dtype)


def perceiver_init(key, cfg: PerceiverConfig) -> Params:
    """Initialise Lens params. Latents ~ N(0,1) like the reference."""
    key, klat = jax.random.split(key)
    p: Params = {"latents": jax.random.normal(klat, (cfg.num_latents, cfg.latent_dim))}
    layers = []
    n_unique = 1 if cfg.weight_tie_layers else cfg.depth
    for _ in range(n_unique):
        key, k1, k2 = jax.random.split(key, 3)
        layer: Params = {
            "cross_attn": {
                "ln_q": layer_norm_init(cfg.latent_dim),
                "ln_kv": layer_norm_init(cfg.input_dim),
                "attn": _attn_init(k1, cfg.latent_dim, cfg.input_dim,
                                   cfg.cross_heads, cfg.cross_dim_head),
            },
            "cross_ff": {
                "ln": layer_norm_init(cfg.latent_dim),
                "ff": _ff_init(k2, cfg.latent_dim, cfg.ff_mult),
            },
            "self_blocks": [],
        }
        for _ in range(cfg.self_per_cross_attn):
            key, k3, k4 = jax.random.split(key, 3)
            layer["self_blocks"].append({
                "attn_ln": layer_norm_init(cfg.latent_dim),
                "attn": _attn_init(k3, cfg.latent_dim, cfg.latent_dim,
                                   cfg.latent_heads, cfg.latent_dim_head),
                "ff_ln": layer_norm_init(cfg.latent_dim),
                "ff": _ff_init(k4, cfg.latent_dim, cfg.ff_mult),
            })
        layers.append(layer)
    p["layers"] = layers
    return p


def point_perceiver_init(key, cfg: PerceiverConfig, embed_dim: int) -> Params:
    """Standalone point-cloud head (reference PointPerceiver,
    perceiver.py:335-366): perceiver -> mean over latents -> LayerNorm ->
    @ proj. The adapter runs separately (models/vit._adapter_apply)."""
    k1, k2 = jax.random.split(key)
    return {
        "perceiver": perceiver_init(k1, cfg),
        "layer_norm": layer_norm_init(cfg.latent_dim),
        "proj": (cfg.latent_dim ** -0.5)
        * jax.random.normal(k2, (cfg.latent_dim, embed_dim)),
    }


def point_perceiver_apply(p: Params, tokens: jnp.ndarray,
                          cfg: PerceiverConfig) -> jnp.ndarray:
    x = perceiver_apply(p["perceiver"], tokens, cfg)
    x = jnp.mean(x, axis=1)
    x = layer_norm(x, p["layer_norm"])
    return x @ p["proj"].astype(x.dtype)


def perceiver_apply(
    p: Params,
    tokens: jnp.ndarray,
    cfg: PerceiverConfig,
) -> jnp.ndarray:
    """Compress [B, N, input_dim] tokens to [B, num_latents, latent_dim].

    Equivalent to reference Perceiver.forward(..., return_embeddings=True)
    (perceiver.py:289-332). Fourier position encoding is not implemented —
    every released ViT-Lens config sets fourier_encode_data=False."""
    if cfg.fourier_encode_data:
        raise NotImplementedError(
            "fourier_encode_data is off in all released ViT-Lens configs"
        )
    B = tokens.shape[0]
    x = jnp.broadcast_to(
        p["latents"].astype(tokens.dtype)[None], (B,) + p["latents"].shape
    )
    for i in range(cfg.depth):
        layer = p["layers"][i if not cfg.weight_tie_layers else 0]
        ca = layer["cross_attn"]
        x = x + _attn(
            layer_norm(x, ca["ln_q"]),
            layer_norm(tokens, ca["ln_kv"]),
            ca["attn"], cfg.cross_heads, cfg.cross_dim_head,
        )
        cf = layer["cross_ff"]
        x = x + _ff(layer_norm(x, cf["ln"]), cf["ff"])
        for sb in layer["self_blocks"]:
            normed = layer_norm(x, sb["attn_ln"])
            x = x + _attn(normed, normed, sb["attn"],
                          cfg.latent_heads, cfg.latent_dim_head)
            x = x + _ff(layer_norm(x, sb["ff_ln"]), sb["ff"])
    return x
