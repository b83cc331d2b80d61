"""Tri-tower contrastive model: frozen CLIP image ViT + Lens visual tower +
CLIP text tower + shared logit scale.

Mirrors reference TriCLIP (model.py:391-622). Functional: params/state are
pytrees; encode_* are pure functions suitable for jit/pjit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import math

import jax
import jax.numpy as jnp

from vitlens_tpu.config import ModelConfig, image_tower_config
from vitlens_tpu.models.text import text_tower_apply, text_tower_init
from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init

Params = Dict[str, Any]
State = Dict[str, Any]


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(dim=-1) equivalent, computed in fp32."""
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
    return (x32 / jnp.maximum(n, eps)).astype(x.dtype)


def tri_model_init(key, cfg: ModelConfig) -> Tuple[Params, State]:
    k_img, k_vis, k_txt = jax.random.split(key, 3)
    img_cfg = image_tower_config(cfg)
    img_p, img_s = vision_tower_init(k_img, img_cfg)
    vis_p, vis_s = vision_tower_init(k_vis, cfg.tower)
    if cfg.text.hf_style:
        from vitlens_tpu.models.bert_text import hf_text_tower_init

        txt_p = hf_text_tower_init(k_txt, cfg.text, cfg.embed_dim)
    else:
        txt_p = text_tower_init(k_txt, cfg.text, cfg.embed_dim)
    params: Params = {
        "image": img_p,
        "visual": vis_p,
        "text": txt_p,
        "logit_scale": jnp.asarray(
            math.log(1.0 / cfg.init_logit_scale_inv_temp), jnp.float32
        ),
    }
    state: State = {"image": img_s, "visual": vis_s}
    return params, state


def encode_image(
    params: Params,
    state: State,
    images: jnp.ndarray,
    cfg: ModelConfig,
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """images [B,3,H,W] or [B,T,3,H,W] (frame-mean aggregation like
    reference model.py:510-523)."""
    img_cfg = image_tower_config(cfg)
    mean_agg = images.ndim == 5
    if mean_agg:
        B, T = images.shape[:2]
        images = images.reshape((B * T,) + images.shape[2:])
    feats, _ = vision_tower_apply(
        params["image"], state["image"], images, img_cfg,
        compute_dtype=compute_dtype, remat=remat,
    )
    if mean_agg:
        feats = feats.reshape(B, T, -1).mean(axis=1)
    return _l2_normalize(feats) if normalize else feats


def encode_text(
    params: Params,
    text: jnp.ndarray,
    cfg: ModelConfig,
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    if cfg.text.hf_style:
        # HF-family tower (reference CustomTextCLIP.encode_text ->
        # HFTextEncoder.forward, model.py:305-312 + hf_model.py:205-224)
        from vitlens_tpu.models.bert_text import hf_text_tower_apply

        feats = hf_text_tower_apply(params["text"], text, cfg.text,
                                    compute_dtype=compute_dtype,
                                    remat=bool(remat))
    else:
        feats = text_tower_apply(
            params["text"], text, cfg.text,
            quick_gelu=cfg.quick_gelu, compute_dtype=compute_dtype,
            remat=remat,
        )
    return _l2_normalize(feats) if normalize else feats


def encode_visual(
    params: Params,
    state: State,
    x: jnp.ndarray,
    cfg: ModelConfig,
    *,
    normalize: bool = False,
    train: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    feats, new_vis_s = vision_tower_apply(
        params["visual"], state["visual"], x, cfg.tower,
        train=train, compute_dtype=compute_dtype, remat=remat,
        fps_key=fps_key, bn_axis_name=bn_axis_name,
    )
    if normalize:
        feats = _l2_normalize(feats)
    return feats, {**state, "visual": new_vis_s}


def tri_forward_video_distill(
    params: Params,
    state: State,
    cfg: ModelConfig,
    *,
    video_frames: jnp.ndarray,  # [B, T, 3, H, W] (image tower input)
    text: jnp.ndarray,
    visual_x: jnp.ndarray,
    train: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    """Video distill-tokens forward (reference model.py:545-585
    vid_distill_tokens branch): frame-mean image features AND tokens +
    visual features/tokens, for TriClipDistillTokenLoss."""
    from vitlens_tpu.models.vit import vision_tower_apply

    img_cfg = image_tower_config(cfg)
    B, T = video_frames.shape[:2]
    frames = video_frames.reshape((B * T,) + video_frames.shape[2:])
    (img_feats, img_tokens), _ = vision_tower_apply(
        params["image"], state["image"], frames, img_cfg,
        compute_dtype=compute_dtype, remat=remat, output_tokens=True,
    )
    img_feats = _l2_normalize(img_feats.reshape(B, T, -1).mean(axis=1))
    img_tokens = img_tokens.reshape((B, T) + img_tokens.shape[1:]).mean(axis=1)

    (vis_feats, vis_tokens), new_vis_s = vision_tower_apply(
        params["visual"], state["visual"], visual_x, cfg.tower,
        train=train, compute_dtype=compute_dtype, remat=remat,
        output_tokens=True,
    )
    out = {
        "image_features": img_feats,
        "image_tokens": img_tokens,
        "text_features": encode_text(params, text, cfg, normalize=True,
                                     compute_dtype=compute_dtype, remat=remat),
        "visual_features": _l2_normalize(vis_feats),
        "visual_tokens": vis_tokens,
        "logit_scale": jnp.exp(params["logit_scale"]).astype(jnp.float32),
    }
    return out, {**state, "visual": new_vis_s}


def tri_forward(
    params: Params,
    state: State,
    cfg: ModelConfig,
    *,
    images: Optional[jnp.ndarray] = None,
    text: Optional[jnp.ndarray] = None,
    visual_x: Optional[jnp.ndarray] = None,
    train: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    """Reference TriCLIP.forward (model.py:542-621) with output_dict=True."""
    out: Dict[str, jnp.ndarray] = {
        "logit_scale": jnp.exp(params["logit_scale"]).astype(jnp.float32)
    }
    new_state = state
    if images is not None:
        out["image_features"] = encode_image(
            params, state, images, cfg,
            normalize=True, compute_dtype=compute_dtype, remat=remat,
        )
    if text is not None:
        out["text_features"] = encode_text(
            params, text, cfg,
            normalize=True, compute_dtype=compute_dtype, remat=remat,
        )
    if visual_x is not None:
        out["visual_features"], new_state = encode_visual(
            params, state, visual_x, cfg,
            normalize=True, train=train, compute_dtype=compute_dtype,
            remat=remat, fps_key=fps_key, bn_axis_name=bn_axis_name,
        )
    return out, new_state
