"""EVA ViT-g trunk and the Perceiver-EVA Lens tower ("vitlensG" for the
MLLM plug-in).

Mirrors /root/reference/vitlens/src/open_clip/third_vit/blip_eva_vit.py:
  * EVA blocks (:216-259) are pre-LN resblocks with LayerNorm eps 1e-6 and a
    qkv bias pattern [q_bias, 0, v_bias] (:155-171) — expressed here with the
    shared stacked-resblock machinery (the bias structure is preserved by the
    converter, the zero k-bias simply lives inside qkv_b).
  * trunk (:380-502): patch-embed conv 14, cls token, abs pos emb [1, N+1, D],
    pos_drop, blocks, final LayerNorm, CLS pooling, then a projection head
    (Linear 1408->1024 or a plain matrix).
  * Perceiver_Blip_EVA_ViT (:594-673): modality adapter -> perceiver ->
    eva trunk (no patch embed, optional pos) -> proj; supports
    skip_trans_first_n_layers = keep the last (layers - n) blocks
    (:629-637), i.e. the same drop-first-n semantics as the CLIP tower.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TowerConfig
from vitlens_tpu.models import layers as L
from vitlens_tpu.models.perceiver import perceiver_apply, perceiver_init
from vitlens_tpu.models.vit import _adapter_apply, _adapter_init

Params = Dict[str, Any]
State = Dict[str, Any]

EVA_LN_EPS = 1e-6


@dataclass(frozen=True)
class EVAArch:
    """create_eva_vit_g defaults (blip_eva_vit.py:763-785)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 39
    head_width: int = 88
    mlp_ratio: float = 4.3637
    proj_dim: int = 1024  # num_classes/"head" used as projection

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def num_patches(self) -> int:
        g = self.image_size // self.patch_size
        return g * g


def eva_trunk_init(key, arch: EVAArch) -> Params:
    k_pe, k_cls, k_pos, k_blocks, k_head = jax.random.split(key, 5)
    width = arch.width
    p: Params = {
        "patch_embed": {
            "w": 0.02 * jax.random.normal(
                k_pe, (3 * arch.patch_size ** 2, width)),
            "b": jnp.zeros((width,)),
        },
        "cls_token": 0.02 * jax.random.normal(k_cls, (width,)),
        "pos_embed": 0.02 * jax.random.normal(
            k_pos, (arch.num_patches + 1, width)),
        "trunk": L.transformer_init(k_blocks, width, arch.layers,
                                    arch.mlp_ratio),
        "norm": L.layer_norm_init(width),
        "head": {
            "w": 0.02 * jax.random.normal(k_head, (width, arch.proj_dim)),
            "b": jnp.zeros((arch.proj_dim,)),
        },
    }
    return p


def eva_trunk_apply(
    p: Params,
    x: jnp.ndarray,
    arch: EVAArch,
    *,
    tokens_input: bool = False,
    use_pos_embed: bool = True,
    skip_first_n: Optional[int] = None,
    apply_head: bool = True,
    remat: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """images [B,3,H,W] (tokens_input=False) or tokens [B,N,width] -> pooled.

    skip_first_n keeps the LAST (layers - skip_first_n) blocks — exactly
    the EVA wrapper's truncation semantics (blip_eva_vit.py:629-637)."""
    x = x.astype(compute_dtype)
    if not tokens_input:
        from vitlens_tpu.adapters.tokenizers import patchify_2d

        x = patchify_2d(x, arch.patch_size) @ p["patch_embed"]["w"].astype(x.dtype)
        x = x + p["patch_embed"]["b"].astype(x.dtype)
    B = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype)[None, None, :],
                           (B, 1, x.shape[-1]))
    h = jnp.concatenate([cls, x], axis=1)
    if use_pos_embed:
        pos = p["pos_embed"].astype(h.dtype)
        if pos.shape[0] != h.shape[1]:
            pos = _resize_pos(p["pos_embed"], h.shape[1]).astype(h.dtype)
        h = h + pos
    h = L.transformer(h, p["trunk"], arch.heads, L.gelu, remat=remat,
                      skip_first_n=skip_first_n, ln_eps=EVA_LN_EPS)
    h = L.layer_norm(h, p["norm"], EVA_LN_EPS)
    pooled = h[:, 0]
    if apply_head:
        pooled = pooled @ p["head"]["w"].astype(pooled.dtype) + \
            p["head"]["b"].astype(pooled.dtype)
    return pooled


def _resize_pos(pos: jnp.ndarray, target: int) -> jnp.ndarray:
    """Bicubic pos-emb resize keeping CLS (interpolate_pos_embed)."""
    n = pos.shape[0] - 1
    g_old = int(round(n ** 0.5))
    g_new = int(round((target - 1) ** 0.5))
    grid = pos[1:].reshape(g_old, g_old, -1)
    resized = jax.image.resize(grid, (g_new, g_new, grid.shape[-1]), "bicubic")
    return jnp.concatenate([pos[:1], resized.reshape(g_new * g_new, -1)], 0)


# ---------------------------------------------------------------------------
# Perceiver + EVA composition (the "perceiver_blip_eva_g_vit" visual arch)
# ---------------------------------------------------------------------------


def perceiver_eva_tower_config(
    modality: str = "pc",
    skip_first_n_layers: Optional[int] = None,
    **tower_kw,
) -> TowerConfig:
    """TowerConfig views of the adapter/perceiver half; the EVA trunk carries
    its own EVAArch (width 1408, 39 layers). Latents/pos sizing follow the
    EVA grid (16x16=256)."""
    from vitlens_tpu.config import make_tower_config

    # reuse the standard per-modality adapter defaults, retargeted at width 1408
    tower = make_tower_config("EVA-g-14", modality, **tower_kw)
    return tower


def perceiver_eva_init(
    key, tower: TowerConfig, eva_arch: EVAArch, embed_dim: int = 1024,
) -> Tuple[Params, State]:
    k_ad, k_perc, k_eva = jax.random.split(key, 3)
    adapter_p, adapter_s = _adapter_init(k_ad, tower)
    p: Params = {"adapter": adapter_p, "eva": eva_trunk_init(k_eva, eva_arch)}
    if tower.perceiver is not None and not tower.perceiver.as_identity:
        p["perceiver"] = perceiver_init(k_perc, tower.perceiver)
    # replace the EVA head when embed dims mismatch (reference builds
    # eva_vit_proj when no usable head exists, blip_eva_vit.py:611-620)
    if eva_arch.proj_dim != embed_dim:
        k_proj = jax.random.fold_in(key, 3)
        p["eva"]["head"] = {
            "w": (eva_arch.width ** -0.5)
            * jax.random.normal(k_proj, (eva_arch.width, embed_dim)),
            "b": jnp.zeros((embed_dim,)),
        }
    return p, {"adapter": adapter_s}


def perceiver_eva_apply(
    p: Params,
    s: State,
    x: jnp.ndarray,
    tower: TowerConfig,
    eva_arch: EVAArch,
    *,
    skip_first_n_layers: Optional[int] = None,
    use_orig_pos: bool = True,
    train: bool = False,
    compute_dtype=jnp.float32,
    fps_key=None,
    bn_axis_name=None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, State]:
    x = x.astype(compute_dtype)
    (tokens, pos), new_adapter_s = _adapter_apply(
        p["adapter"], s["adapter"], x, tower, train,
        fps_key=fps_key, bn_axis_name=bn_axis_name,
    )
    if pos is not None and tower.use_adapter_pos:
        tokens = tokens + pos.astype(tokens.dtype)
    if "perceiver" in p:
        tokens = perceiver_apply(p["perceiver"], tokens, tower.perceiver)
    # EVA keeps the LAST n-keep layers when skipping
    skip = skip_first_n_layers
    pooled = eva_trunk_apply(
        p["eva"], tokens, eva_arch,
        tokens_input=True, use_pos_embed=use_orig_pos,
        skip_first_n=skip, compute_dtype=compute_dtype, remat=remat,
    )
    return pooled, {**s, "adapter": new_adapter_s}


# ---------------------------------------------------------------------------
# weight conversion (BLIP-2 eva_vit_g.pth naming)
# ---------------------------------------------------------------------------


def convert_eva_state_dict(sd, arch: EVAArch) -> Params:
    """blocks.N.{norm1,attn.qkv,attn.q_bias,attn.v_bias,attn.proj,norm2,
    mlp.fc1,mlp.fc2}, patch_embed.proj, cls_token, pos_embed, norm, head."""

    from vitlens_tpu.weights.torch_convert import _j, _ln, _np

    def stack(items):
        return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *items)

    blocks = []
    for i in range(arch.layers):
        pre = f"blocks.{i}."
        qkv_w = _j(sd[f"{pre}attn.qkv.weight"]).T  # [D, 3D]
        d = qkv_w.shape[0]
        q_b = _j(sd[f"{pre}attn.q_bias"])
        v_b = _j(sd[f"{pre}attn.v_bias"])
        qkv_b = jnp.concatenate([q_b, jnp.zeros_like(q_b), v_b])
        blk = {
            "ln_1": _ln(sd, f"{pre}norm1"),
            "attn": {
                "qkv_w": qkv_w,
                "qkv_b": qkv_b,
                "out_w": _j(sd[f"{pre}attn.proj.weight"]).T,
                "out_b": _j(sd[f"{pre}attn.proj.bias"]),
            },
            "ln_2": _ln(sd, f"{pre}norm2"),
            "mlp": {
                "fc": {"w": _j(sd[f"{pre}mlp.fc1.weight"]).T,
                       "b": _j(sd[f"{pre}mlp.fc1.bias"])},
                "proj": {"w": _j(sd[f"{pre}mlp.fc2.weight"]).T,
                         "b": _j(sd[f"{pre}mlp.fc2.bias"])},
            },
        }
        blocks.append(blk)

    pe_w = _np(sd["patch_embed.proj.weight"])  # [W, 3, p, p]
    p: Params = {
        "patch_embed": {
            "w": jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T, jnp.float32),
            "b": _j(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _j(sd["cls_token"]).reshape(-1),
        "pos_embed": _j(sd["pos_embed"]).reshape(-1, arch.width),
        "trunk": {"blocks": stack(blocks)},
        "norm": _ln(sd, "norm"),
    }
    if "head.weight" in sd:
        p["head"] = {"w": _j(sd["head.weight"]).T, "b": _j(sd["head.bias"])}
    else:
        p["head"] = {"w": jnp.eye(arch.width), "b": jnp.zeros((arch.width,))}
    return p
