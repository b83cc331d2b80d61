"""OpenShape-triplet trainer for vitlensG (ViT-bigG Lens).

TPU re-design of /root/reference/VitLens-OpenShape/src/{main,train,data}.py:
  * CLIPBind tower: PNSA point tokenizer -> perceiver Lens -> bigG ViT with
    the first 16 trunk layers skipped (clip_bind.py:13-54; configs/train.yaml)
    plus a replacement projection when the CLIP proj dim != out_channel.
  * separate trainable LogitScaleNetwork and image/text projection linears
    (main.py:154-196).
  * contrastive loss against PRECOMPUTED OpenCLIP text/image embeddings
    stored with each object (train.py:175-191, data.py:150-236), with
    optional hard-negative masks: kNN-group mask (kron-eye, train.py:241-250)
    and sim-margin mask (train.py:275-284).
  * param groups with 0.1x LR on the ViT trunk (main.py:240-246), expressed
    as an LR-scale pytree multiplied into optimizer updates.
  * eval: cosine retrieval against precomputed text-class embeddings
    (train.py:608-715, inference.py:182-196).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.config import (
    PerceiverConfig, PointAdapterConfig, TowerConfig, get_arch,
)
from vitlens_tpu.models.layers import _kaiming_uniform, _bias_uniform
from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
from vitlens_tpu.train.losses import cross_entropy, gather_features

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def vitlensG_tower_config(out_channel: int = 1280,
                          skip_first_n_layers: int = 16) -> TowerConfig:
    """bigG Lens with PNSA tokenizer. Values from the published vitlensG
    recipe (TRAIN_INFERENCE.md "Train vitlensG on OpenShape-Triplets"):
    pc_in_channel 6, radius 0.2, npoints 10000, num_group 512, group_size 64,
    trans_dim 256; perceiver depth 4, latents 256, latent_dim 1664,
    cross/latent_dim_head 104, latent_heads 16; skip first 16 of 48 layers."""
    arch_entry = get_arch("ViT-bigG-14")
    arch = arch_entry["vision"]
    pt = PointAdapterConfig(tokenizer="pnsa", trans_dim=256, encoder_dims=256,
                            group_size=64, num_group=512, in_channel=6,
                            npoints=10000, radius=0.2)
    perc = PerceiverConfig(
        depth=4, num_latents=256, latent_dim=arch.width,
        input_dim=256, cross_heads=1, cross_dim_head=104,
        latent_heads=16, latent_dim_head=104,
        self_per_cross_attn=1,
    )
    return TowerConfig(
        arch=arch, embed_dim=arch_entry["embed_dim"], modality="pc",
        point=pt, perceiver=perc, skip_first_n_layers=skip_first_n_layers,
    )


def clip_bind_init(key, tower_cfg: TowerConfig, out_channel: int) -> Tuple[Params, Params]:
    k_bb, k_proj, k_ls, k_ip, k_tp = jax.random.split(key, 5)
    bb_params, bb_state = vision_tower_init(k_bb, tower_cfg)
    params: Params = {"backbone": bb_params}
    if tower_cfg.embed_dim != out_channel:
        # replace CLIP proj with a fresh Linear width->out_channel and DROP
        # the backbone proj (reference sets backbone.proj = None,
        # clip_bind.py:38-49): keeping it would carry a dead 1664x1280
        # param through optimizer slots and let weight decay mutate it
        bb_params.pop("proj", None)
        params["proj_layer"] = {
            "w": _kaiming_uniform(k_proj, (tower_cfg.arch.width, out_channel)),
            "b": _bias_uniform(k_proj, tower_cfg.arch.width, out_channel),
        }
    # separate modules (reference main.py:154-196)
    params["logit_scale"] = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    params["image_proj"] = {
        "w": _kaiming_uniform(k_ip, (out_channel, out_channel)),
        "b": jnp.zeros((out_channel,)),
    }
    params["text_proj"] = {
        "w": _kaiming_uniform(k_tp, (out_channel, out_channel)),
        "b": jnp.zeros((out_channel,)),
    }
    return params, {"backbone": bb_state}


def clip_bind_apply(params: Params, state: Params, xyz_features: jnp.ndarray,
                    tower_cfg: TowerConfig, *, train: bool = False,
                    compute_dtype=jnp.float32, fps_key=None,
                    bn_axis_name=None) -> Tuple[jnp.ndarray, Params]:
    """xyz_features [B, N, 3(+D)] -> [B, out_channel]."""
    bb_params = params["backbone"]
    if "proj_layer" in params:
        bb_params = dict(bb_params)
        bb_params["proj"] = jnp.eye(tower_cfg.arch.width, dtype=jnp.float32)
    feats, new_bb_state = vision_tower_apply(
        bb_params, state["backbone"], xyz_features, tower_cfg,
        train=train, compute_dtype=compute_dtype, fps_key=fps_key,
        bn_axis_name=bn_axis_name,
    )
    if "proj_layer" in params:
        pl = params["proj_layer"]
        feats = feats @ pl["w"].astype(feats.dtype) + pl["b"].astype(feats.dtype)
    return feats, {"backbone": new_bb_state}


# ---------------------------------------------------------------------------
# pc baseline encoders behind the same bind surface
# (reference models/__init__.py::make switch, main.py model construction)
# ---------------------------------------------------------------------------


def baseline_bind_init(key, name: str, *, in_channel: int = 6,
                       out_channel: int = 1280,
                       scaling: int = 3) -> Tuple[Params, Params]:
    """Like clip_bind_init but with a pc baseline (PointBERT/DGCNN/PointNet,
    models/pc_baselines.py) as the encoder. PointNet2 is classification-only
    (no bind surface in the reference either)."""
    from vitlens_tpu.models.pc_baselines import make_pc_baseline

    init, _ = make_pc_baseline(name, in_channel=in_channel,
                               out_channel=out_channel, scaling=scaling)
    k_enc, k_ip, k_tp = jax.random.split(key, 3)
    enc_p, enc_s = init(k_enc)
    params: Params = {
        "encoder": enc_p,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "image_proj": {"w": _kaiming_uniform(k_ip, (out_channel, out_channel)),
                       "b": jnp.zeros((out_channel,))},
        "text_proj": {"w": _kaiming_uniform(k_tp, (out_channel, out_channel)),
                      "b": jnp.zeros((out_channel,))},
    }
    return params, {"encoder": enc_s}


def baseline_bind_apply(params: Params, state: Params,
                        xyz_features: jnp.ndarray, name: str, *,
                        in_channel: int = 6, out_channel: int = 1280,
                        scaling: int = 3, train: bool = False,
                        compute_dtype=jnp.float32, fps_key=None,
                        bn_axis_name=None) -> Tuple[jnp.ndarray, Params]:
    """xyz_features [B, N, 3(+D)] -> [B, out_channel] through a baseline.
    Same contract as clip_bind_apply (the trainer's forward_model dense
    path, reference train.py:193-219 model(xyz, features))."""
    del compute_dtype  # baselines are small; run them fp32
    from vitlens_tpu.models.pc_baselines import make_pc_baseline

    _, apply = make_pc_baseline(name, in_channel=in_channel,
                                out_channel=out_channel, scaling=scaling)
    xyz = xyz_features[..., :3].astype(jnp.float32)
    feats = xyz_features.astype(jnp.float32)
    kw = dict(train=train, bn_axis_name=bn_axis_name)
    if name == "PointBERT":
        kw["fps_key"] = fps_key
    emb, new_s = apply(params["encoder"], state["encoder"], xyz, feats, **kw)
    return emb, {"encoder": new_s}


# ---------------------------------------------------------------------------
# losses + masks
# ---------------------------------------------------------------------------


def contras_loss(feat1: jnp.ndarray, feat2: jnp.ndarray,
                 logit_scale: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None):
    """Reference Trainer.contras_loss (train.py:175-191): normalize both,
    all-gather both, full-matrix logits (optionally * mask), symmetric CE.
    Returns (loss, top-1 accuracy)."""

    def n(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    f1 = gather_features(n(feat1), axis_name)
    f2 = gather_features(n(feat2), axis_name)
    logits = logit_scale.astype(jnp.float32) * f1 @ f2.T
    if mask is not None:
        logits = logits * mask
    labels = jnp.arange(logits.shape[0])
    acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
    loss = 0.5 * (cross_entropy(logits, labels) + cross_entropy(logits.T, labels))
    return loss, acc


def knn_negative_mask(batch_size: int, k: int) -> np.ndarray:
    """(k*s) x (k*s) mask keeping the diagonal and zeroing other members of
    the same kNN group (train.py:241-250): eye(ks) | ~kron(eye(s), 1_kxk)."""
    ks = batch_size * k
    m1 = np.eye(ks, dtype=bool)
    m2 = np.kron(np.eye(batch_size, dtype=bool), np.ones((k, k), dtype=bool))
    return np.logical_or(m1, ~m2).astype(np.float32)


def sim_margin_mask(img_feat: jnp.ndarray, text_feat: jnp.ndarray,
                    threshold: float,
                    base_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Zero negatives whose image-text teacher sim is within `threshold` of
    the diagonal (train.py:275-284)."""

    def n(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    sim = n(img_feat) @ n(text_feat).T
    mask = (jnp.diagonal(sim)[:, None] - sim) > threshold
    if base_mask is not None:
        mask = jnp.logical_or(mask, base_mask.astype(bool))
    return jax.lax.stop_gradient(mask.astype(jnp.float32))


# ---------------------------------------------------------------------------
# lr scaling (0.1x on the ViT trunk — main.py:240-246)
# ---------------------------------------------------------------------------


def trunk_lr_scale(params: Params, scale: float = 0.1) -> Params:
    def build(tree, in_trunk=False):
        if isinstance(tree, dict):
            return {k: build(v, in_trunk or k == "trunk") for k, v in tree.items()}
        if isinstance(tree, list):
            return [build(v, in_trunk) for v in tree]
        return jnp.asarray(scale if in_trunk else 1.0)

    return build(params)


def openshape_loss(
    params: Params,
    state: Params,
    batch: Dict[str, jnp.ndarray],
    tower_cfg: TowerConfig,
    *,
    text_weight: float = 1.0,
    image_weight: float = 1.0,
    use_text_proj: bool = False,
    use_image_proj: bool = False,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    compute_dtype=jnp.float32,
    train: bool = True,
    fps_key=None,
    pc_model: str = "clipbind",
    pc_scaling: int = 3,
    pc_in_channel: int = 6,
):
    """Full OpenShape step loss (train.py:255-330): pred vs precomputed
    text_feat and img_feat. `pc_model` selects the shipped CLIPBind Lens
    tower or one of the comparison baselines (reference config
    model.name)."""
    if pc_model == "clipbind":
        pred, new_state = clip_bind_apply(
            params, state, batch["xyz_features"], tower_cfg,
            train=train, compute_dtype=compute_dtype, fps_key=fps_key,
            bn_axis_name=axis_name,
        )
    else:
        pred, new_state = baseline_bind_apply(
            params, state, batch["xyz_features"], pc_model,
            in_channel=pc_in_channel,
            out_channel=batch["text_feat"].shape[-1], scaling=pc_scaling,
            train=train, fps_key=fps_key, bn_axis_name=axis_name,
        )
    scale = jnp.exp(params["logit_scale"])
    text_feat = batch["text_feat"].astype(jnp.float32)
    img_feat = batch["img_feat"].astype(jnp.float32)
    if use_text_proj:
        tp = params["text_proj"]
        text_feat = text_feat @ tp["w"] + tp["b"]
    if use_image_proj:
        ip = params["image_proj"]
        img_feat = img_feat @ ip["w"] + ip["b"]
    t_loss, t_acc = contras_loss(pred, text_feat, scale, mask, axis_name)
    i_loss, i_acc = contras_loss(pred, img_feat, scale, mask, axis_name)
    loss = text_weight * t_loss + image_weight * i_loss
    metrics = {"text_loss": t_loss, "img_loss": i_loss,
               "text_acc": t_acc, "img_acc": i_acc}
    return loss, (metrics, new_state)


# ---------------------------------------------------------------------------
# dataset ("Four" triplets — data.py:19-296)
# ---------------------------------------------------------------------------


class OpenShapeTripletDataset:
    """Per-object npy blobs with xyz/rgb + precomputed CLIP text/img feats.
    y-up swap, 10k-point sample, normalize, z-rotation + rgb-drop augs."""

    def __init__(self, file_list, npoints: int = 10000, y_up: bool = True,
                 augment: bool = True, rgb_drop_prob: float = 0.5,
                 use_color: bool = True, seed: int = 0):
        self.files = list(file_list)
        self.npoints = npoints
        self.y_up = y_up
        self.augment = augment
        self.rgb_drop_prob = rgb_drop_prob
        self.use_color = use_color
        from vitlens_tpu.data.rng import ThreadLocalRNG

        self.rng = ThreadLocalRNG(seed)  # loader threads share this dataset

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        blob = np.load(self.files[idx], allow_pickle=True).item()
        xyz = np.asarray(blob["xyz"], np.float32)
        rgb = np.asarray(blob.get("rgb", np.full_like(xyz, 0.4)), np.float32)
        n = xyz.shape[0]
        sel = self.rng.permutation(n)[: self.npoints]
        if len(sel) < self.npoints:
            sel = np.concatenate(
                [sel, self.rng.randint(0, n, self.npoints - len(sel))])
        xyz, rgb = xyz[sel], rgb[sel]
        if self.y_up:  # swap y/z (reference data.py get_others)
            xyz = xyz[:, [0, 2, 1]]
        # normalize to unit ball
        xyz = xyz - xyz.mean(0)
        xyz = xyz / np.maximum(np.linalg.norm(xyz, axis=1).max(), 1e-6)
        if self.augment:
            theta = self.rng.uniform(0, 2 * np.pi)
            c, s = np.cos(theta), np.sin(theta)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            xyz = xyz @ rot.T
            if self.rng.random_sample() < self.rgb_drop_prob:
                rgb = np.full_like(rgb, 0.4)
        feats = np.concatenate([xyz, rgb], axis=1) if self.use_color else xyz
        return {
            "id": idx,
            "xyz_features": feats,  # [:, :3] = xyz; full 6-dim = SA features
            "text_feat": np.asarray(blob["text_feat"], np.float32).reshape(-1),
            "img_feat": np.asarray(blob["img_feat"], np.float32).reshape(-1),
        }


def precomputed_text_eval(pred_feats: np.ndarray, labels: np.ndarray,
                          class_text_feats: np.ndarray,
                          topk=(1, 3, 5)) -> Dict[str, float]:
    """ModelNet40/LVIS/ScanObjectNN eval against precomputed per-class text
    embeddings (train.py:608-715)."""

    def n(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    logits = n(pred_feats) @ n(class_text_feats).T
    order = np.argsort(-logits, axis=1)
    out = {}
    for k in topk:
        out[f"top{k}"] = float(
            np.mean(np.any(order[:, :k] == labels[:, None], axis=1)))
    # per-class (macro) top-1 (reference modelnet40 class acc)
    cls_accs = []
    for c in np.unique(labels):
        m = labels == c
        cls_accs.append(np.mean(order[m, 0] == c))
    out["class_top1"] = float(np.mean(cls_accs))
    return out
