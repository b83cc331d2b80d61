"""Linear probe on a frozen Lens backbone.

Mirrors reference ViTLensLP (/root/reference/vitlens/src/open_clip/
linprobe_model.py:15-82): frozen Lens vision tower (with or without the
final CLIP projection) -> head = Dropout -> BatchNorm1d(affine=False,
eps=1e-6) -> Linear(num_classes). Only the head trains
(linprobe_main.py:284 trains lp_head with AdamW).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TowerConfig
from vitlens_tpu.models.layers import _bias_uniform, _kaiming_uniform
from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init

Params = Dict[str, Any]
State = Dict[str, Any]


def linear_probe_init(
    key, tower_cfg: TowerConfig, num_classes: int,
    enable_vit_proj: bool = False,
) -> Tuple[Params, State]:
    k_bb, k_head = jax.random.split(key)
    bb_params, bb_state = vision_tower_init(k_bb, tower_cfg)
    lp_dim = tower_cfg.embed_dim if enable_vit_proj else tower_cfg.arch.width
    kw, kb = jax.random.split(k_head)
    params: Params = {
        "backbone": bb_params,
        "lp_head": {
            "w": _kaiming_uniform(kw, (lp_dim, num_classes)),
            "b": _bias_uniform(kb, lp_dim, num_classes),
        },
    }
    state: State = {
        "backbone": bb_state,
        "head_bn": {"mean": jnp.zeros((lp_dim,)), "var": jnp.ones((lp_dim,))},
    }
    return params, state


def linear_probe_apply(
    params: Params,
    state: State,
    x: jnp.ndarray,
    tower_cfg: TowerConfig,
    *,
    enable_vit_proj: bool = False,
    train: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    bn_momentum: float = 0.1,
    bn_eps: float = 1e-6,
) -> Tuple[jnp.ndarray, State]:
    """x -> logits [B, num_classes]; returns updated BN state."""
    bb_params = params["backbone"]
    if not enable_vit_proj:
        # disable the CLIP projection: take ln_post pooled features
        # (reference sets backbone.proj = None, returning `pooled` pre-proj)
        bb_params = dict(bb_params)
        bb_params["proj"] = jnp.eye(tower_cfg.arch.width,
                                    dtype=jnp.float32)
    feats, new_bb_state = vision_tower_apply(
        bb_params, state["backbone"], x, tower_cfg,
        train=False, compute_dtype=compute_dtype,
    )
    h = feats.astype(jnp.float32)
    if train and dropout_rate > 0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    # BatchNorm1d affine=False
    bn = state["head_bn"]
    if train:
        mean = jnp.mean(h, axis=0)
        var = jnp.mean(jnp.square(h), axis=0) - jnp.square(mean)
        n = h.shape[0]
        new_bn = {
            "mean": (1 - bn_momentum) * bn["mean"] + bn_momentum * mean,
            "var": (1 - bn_momentum) * bn["var"]
            + bn_momentum * var * (n / max(n - 1, 1)),
        }
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    h = (h - mean) * jax.lax.rsqrt(var + bn_eps)
    logits = h @ params["lp_head"]["w"] + params["lp_head"]["b"]
    new_state = {"backbone": new_bb_state, "head_bn": new_bn}
    return logits, new_state


def lp_trainable_mask(params: Params) -> Params:
    """Only lp_head trains (reference lp_lock_parameters)."""
    from vitlens_tpu.train.freeze import ones_like_mask, zeros_like_mask

    return {
        "backbone": zeros_like_mask(params["backbone"]),
        "lp_head": ones_like_mask(params["lp_head"]),
    }


def softmax_cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray):
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logits.astype(jnp.float32), labels[:, None], axis=-1)[:, 0]
    return jnp.mean(lse - picked)
