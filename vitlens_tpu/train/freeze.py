"""Freeze/partial-unfreeze masks.

Re-expresses the reference lock zoo (transformer.py:553-627 VisionTransformer
.lock, model.py:448-502 TriCLIP.lock_*_tower, TextTransformer.lock) as 0/1
trainability masks over the param pytree. Masks multiply optimizer UPDATES
(not just grads), so frozen params see neither momentum nor weight decay —
equivalent to requires_grad=False under torch AdamW.

Per-layer granularity inside the scan-stacked trunk uses masks with a leading
[layers, 1, ...] axis, broadcast against the stacked leaves.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vitlens_tpu.config import ModelConfig

Params = Dict[str, Any]


def ones_like_mask(params: Params):
    return jax.tree.map(lambda p: jnp.ones((1,) * p.ndim, p.dtype), params)


def zeros_like_mask(params: Params):
    return jax.tree.map(lambda p: jnp.zeros((1,) * p.ndim, p.dtype), params)


def _layer_range_mask(blocks: Params, lo: int, hi: int, n_layers: int):
    """Mask stacked trunk blocks: 1 for layer index in [lo, hi)."""
    sel = (jnp.arange(n_layers) >= lo) & (jnp.arange(n_layers) < hi)

    def leaf_mask(p):
        shape = (n_layers,) + (1,) * (p.ndim - 1)
        return sel.astype(p.dtype).reshape(shape)

    return jax.tree.map(leaf_mask, blocks)


def _merge_max(a, b):
    return jax.tree.map(jnp.maximum, a, b)


def vision_tower_mask(
    params: Params,
    n_layers: int,
    *,
    locked: bool = True,
    unlocked_groups: int = 0,
    unlock_from_head: bool = False,
    unlock_cls: bool = False,
    unlock_pos_emb: bool = False,
    unlock_trans_first_n_layers: Optional[int] = None,
    lens_always_unlocked: bool = True,
) -> Params:
    """Trainability mask for one vision tower.

    Group layout mirrors the reference (transformer.py:564-578):
      group 0      = stem (patch embed / adapter conv path params shared via
                     'adapter', class_embedding, positional_embedding, ln_pre)
      groups 1..L-1 = resblocks[0..L-2]
      group L      = resblocks[L-1] + ln_post
      group L+1    = proj
    Perceiver + adapter are ALWAYS unlocked when the tower is a Lens tower
    (transformer.py:598-603)."""
    if not locked:
        return ones_like_mask(params)
    mask = zeros_like_mask(params)

    n_groups = n_layers + 2  # stem + (L-1 single blocks) + [last+ln_post] + proj

    def unlock_group(m: Params, gi: int) -> Params:
        out = dict(m)
        if gi == 0:
            for k in ("adapter", "class_embedding", "positional_embedding", "ln_pre"):
                if k in params:
                    out[k] = ones_like_mask(params[k])
        elif gi <= n_layers - 1:  # resblock gi-1
            out["trunk"] = {"blocks": _merge_max(
                m["trunk"]["blocks"],
                _layer_range_mask(params["trunk"]["blocks"], gi - 1, gi, n_layers),
            )}
        elif gi == n_layers:  # last resblock + ln_post
            out["trunk"] = {"blocks": _merge_max(
                m["trunk"]["blocks"],
                _layer_range_mask(params["trunk"]["blocks"], n_layers - 1,
                                  n_layers, n_layers),
            )}
            out["ln_post"] = ones_like_mask(params["ln_post"])
        else:  # proj
            out["proj"] = ones_like_mask(params["proj"])
        return out

    if unlocked_groups:
        idxs = (
            range(unlocked_groups)
            if unlock_from_head
            else range(n_groups - unlocked_groups, n_groups)
        )
        for gi in idxs:
            mask = unlock_group(mask, gi)

    # Lens components always train (transformer.py:598-603); for the plain
    # image tower the "adapter" is the conv patch embed and follows group 0.
    mask = dict(mask)
    if lens_always_unlocked:
        if "perceiver" in params:
            mask["perceiver"] = ones_like_mask(params["perceiver"])
        if "adapter" in params:
            mask["adapter"] = ones_like_mask(params["adapter"])
    if unlock_cls:
        mask["class_embedding"] = ones_like_mask(params["class_embedding"])
    if unlock_pos_emb:
        mask["positional_embedding"] = ones_like_mask(params["positional_embedding"])
    if unlock_trans_first_n_layers:
        mask["trunk"] = {"blocks": _merge_max(
            mask["trunk"]["blocks"],
            _layer_range_mask(params["trunk"]["blocks"], 0,
                              unlock_trans_first_n_layers, n_layers),
        )}
    return mask


def image_tower_image_mask(params: Params, n_layers: int, *, locked=True,
                           unlocked_groups=0, unlock_cls=False,
                           unlock_pos_emb=False) -> Params:
    """Image tower lock (model.py:458-468): the conv patch embed belongs to
    the stem group and stays locked unless group 0 is unlocked."""
    return vision_tower_mask(
        params, n_layers, locked=locked, unlocked_groups=unlocked_groups,
        unlock_cls=unlock_cls, unlock_pos_emb=unlock_pos_emb,
        lens_always_unlocked=False,
    )


def tri_model_mask(
    params: Params,
    cfg: ModelConfig,
    *,
    lock_image: bool = True,
    lock_text: bool = True,
    lock_visual: bool = True,
    image_unlocked_groups: int = 0,
    visual_unlocked_groups: int = 0,
    unlock_from_head: bool = False,
    unlock_cls: bool = False,
    unlock_pos_emb: bool = False,
    unlock_trans_first_n_layers: Optional[int] = None,
    train_logit_scale: bool = True,
) -> Params:
    """Full TriModel trainability mask, mirroring the reference flag surface
    (params.py --lock-image/--lock-text/--lock-visual + unlock-* flags)."""
    mask: Params = {}
    mask["image"] = image_tower_image_mask(
        params["image"], cfg.vision.layers,
        locked=lock_image, unlocked_groups=image_unlocked_groups,
    )
    mask["visual"] = vision_tower_mask(
        params["visual"], cfg.tower.arch.layers,
        locked=lock_visual,
        unlocked_groups=visual_unlocked_groups,
        unlock_from_head=unlock_from_head,
        unlock_cls=unlock_cls,
        unlock_pos_emb=unlock_pos_emb,
        unlock_trans_first_n_layers=unlock_trans_first_n_layers,
    )
    mask["text"] = (
        zeros_like_mask(params["text"]) if lock_text
        else ones_like_mask(params["text"])
    )
    mask["logit_scale"] = jnp.asarray(1.0 if train_logit_scale else 0.0)
    return mask


def apply_mask(tree: Params, mask: Params) -> Params:
    return jax.tree.map(lambda t, m: t * m.astype(t.dtype), tree, mask)


def count_trainable(params: Params, mask: Params) -> int:
    """Trainable-parameter census (reference audio_main.py:323-343)."""
    total = 0
    for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)):
        n_masked = int(jnp.sum(jnp.broadcast_to(m, p.shape) > 0))
        total += n_masked
    return total
