"""Lens-aware Vision Transformer tower.

Composition (mirrors reference VisionTransformer.forward, transformer.py:714-787):
    modality adapter -> (+ adapter pos) -> Perceiver Lens -> prepend CLS
    -> + learned positional embedding -> ln_pre -> trunk (N resblocks)
    -> CLS pool -> ln_post -> @ proj

TPU design notes:
  * the trunk runs as a single lax.scan over stacked layer params;
  * compute dtype is a call-site choice (bf16 on TPU) with fp32 LayerNorm;
  * everything is a pure function of (params, state, inputs) — pjit-ready.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TowerConfig
from vitlens_tpu.adapters import tokenizers as tok
from vitlens_tpu.models import layers as L
from vitlens_tpu.models.perceiver import perceiver_apply, perceiver_init

Params = Dict[str, Any]
State = Dict[str, Any]


def _adapter_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    m = cfg.modality
    if m in ("image", "tactile"):
        return tok.image_adapter_init(key, cfg)
    if m == "video":
        k1, k2 = jax.random.split(key)
        p, s = tok.image_adapter_init(k1, cfg)
        if cfg.video.use_ltpos:
            # learned temporal position nn.Embedding(n_frames, width)
            p["ltpos"] = 0.02 * jax.random.normal(
                k2, (cfg.video.n_frames, cfg.arch.width))
        return p, s
    if m == "depth":
        return tok.depth_adapter_init(key, cfg)
    if m == "audio":
        return tok.audio_adapter_init(key, cfg)
    if m == "eeg":
        return tok.eeg_adapter_init(key, cfg)
    if m == "pc":
        if cfg.point.tokenizer == "pointbert":
            return tok.point_tokenizer_init(key, cfg.point)
        if cfg.point.tokenizer == "pnsa":
            return tok.pnsa_tokenizer_init(key, cfg.point)
        raise ValueError(cfg.point.tokenizer)
    raise NotImplementedError(f"modality {m!r}")


def _adapter_apply(
    p: Params, s: State, x: jnp.ndarray, cfg: TowerConfig,
    train: bool, fps_key=None, bn_axis_name=None,
):
    m = cfg.modality
    if m in ("image", "tactile"):
        return tok.image_adapter_apply(p, s, x, train)
    if m == "depth":
        return tok.depth_adapter_apply(p, s, x, train)
    if m == "audio":
        return tok.audio_adapter_apply(p, s, x, cfg.audio, train)
    if m == "eeg":
        return tok.eeg_adapter_apply(p, s, x, cfg.eeg, train)
    if m == "pc":
        if cfg.point.tokenizer == "pointbert":
            return tok.point_tokenizer_apply(
                p, s, x, cfg.point, train, fps_key=fps_key, bn_axis_name=bn_axis_name
            )
        # pnsa input convention: x[..., :3] is xyz; SA features are the full
        # vector when in_channel == C (OpenShape feeds xyz+rgb as features,
        # train.py:193-219), else the trailing channels.
        feats = x if cfg.point.in_channel == x.shape[-1] else x[..., 3:]
        return tok.pnsa_tokenizer_apply(
            p, s, feats, x[..., :3], cfg.point,
            train, fps_key=fps_key, bn_axis_name=bn_axis_name,
        )
    raise NotImplementedError(m)


def vision_tower_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    arch = cfg.arch
    width = arch.width
    scale = width ** -0.5
    k_ad, k_perc, k_cls, k_pos, k_trunk, k_proj = jax.random.split(key, 6)

    adapter_p, adapter_s = _adapter_init(k_ad, cfg)
    p: Params = {"adapter": adapter_p}
    s: State = {"adapter": adapter_s}

    if cfg.perceiver is not None and not (
        cfg.perceiver.as_identity or cfg.perceiver.as_transformer
    ):
        p["perceiver"] = perceiver_init(k_perc, cfg.perceiver)
    elif cfg.perceiver is not None and cfg.perceiver.as_transformer:
        # perceiver_as_transformer: a plain resblock stack at trunk width
        # (reference get_perceiver, perceiver.py:372-381)
        p["perceiver_transformer"] = L.transformer_init(
            k_perc, width, cfg.perceiver.depth, arch.mlp_ratio,
            arch.ls_init_value)

    p["class_embedding"] = scale * jax.random.normal(k_cls, (width,))
    p["positional_embedding"] = scale * jax.random.normal(
        k_pos, (cfg.num_tokens + 1, width)
    )
    p["ln_pre"] = L.layer_norm_init(width)
    p["trunk"] = L.transformer_init(
        k_trunk, width, arch.layers, arch.mlp_ratio, arch.ls_init_value
    )
    p["ln_post"] = L.layer_norm_init(width)
    p["proj"] = scale * jax.random.normal(k_proj, (width, cfg.embed_dim))
    return p, s


def vision_tower_apply(
    p: Params,
    s: State,
    x: jnp.ndarray,
    cfg: TowerConfig,
    *,
    train: bool = False,
    remat: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    output_tokens: bool = False,
):
    """Encode one modality batch -> (features [B, embed_dim], new_state).

    With output_tokens=True returns ((pooled, tokens), new_state) like the
    reference output_tokens path (transformer.py:784-787)."""
    if "lora" in p:
        # LoRA-adapted tower (train/lora.py): merge W + (alpha/r)·a@b at
        # entry — one tiny einsum per adapted matmul that XLA fuses with
        # the consumer's operand load; gradients flow through the merge
        # into the factors while the base weights stay frozen via the
        # trainability mask. Beyond-reference (the reference only has the
        # whole-group lock/unlock zoo, transformer.py:553-627).
        from vitlens_tpu.train.lora import merge_lora

        p = merge_lora(p)
    if cfg.modality == "audio" and x.ndim == 2:
        # raw waveform input [B, samples]: fbank on-device (fused into the
        # encode graph — the TPU-native alternative to host preprocessing)
        from vitlens_tpu.ops.fbank import fbank_fixed_length

        x = fbank_fixed_length(
            x, target_length=cfg.audio.target_length,
            sample_frequency=float(cfg.audio.sampling_rate),
            num_mel_bins=cfg.audio.mel_bins,
        )
    x = x.astype(compute_dtype)
    if cfg.modality == "video":
        # reference vid_adapter_forward (transformer.py:679-712), ltpos path:
        # per-frame patch embed + learned temporal pos (+ spatial pos pre-
        # perceiver when the Lens is enabled), frames flattened into tokens.
        B, T = x.shape[:2]
        frames = x.reshape((B * T,) + x.shape[2:])
        (ftokens, _), new_adapter_s = tok.image_adapter_apply(
            p["adapter"], s["adapter"], frames, train)
        if cfg.video.use_ltpos and "ltpos" in p["adapter"]:
            lt = p["adapter"]["ltpos"].astype(ftokens.dtype)  # [T, width]
            L_f = ftokens.shape[1]
            ftokens = (ftokens.reshape(B, T, L_f, -1)
                       + lt[None, :, None, :]).reshape(B * T, L_f, -1)
        # the reference adds the spatial pos whenever use_perceiver is set
        # (transformer.py:703-705) — including the identity-perceiver
        # ablation, where only the MODULE becomes nn.Identity
        # (perceiver.py:369-371), so do not gate on as_identity here
        if cfg.perceiver is not None:
            ftokens = ftokens + p["positional_embedding"][1:].astype(
                ftokens.dtype)
        tokens = ftokens.reshape(B, T * ftokens.shape[1], -1)
    else:
        (tokens, pos), new_adapter_s = _adapter_apply(
            p["adapter"], s["adapter"], x, cfg, train,
            fps_key=fps_key, bn_axis_name=bn_axis_name,
        )
        if pos is not None and cfg.use_adapter_pos:
            tokens = tokens + pos.astype(tokens.dtype)

    if cfg.perceiver is not None and not (
        cfg.perceiver.as_identity or cfg.perceiver.as_transformer
    ):
        tokens = perceiver_apply(p["perceiver"], tokens, cfg.perceiver)
    elif "perceiver_transformer" in p:
        # perceiver_as_transformer mode (reference perceiver.py:372-381)
        tokens = L.transformer(
            tokens, p["perceiver_transformer"], cfg.arch.heads,
            L.get_act(cfg.quick_gelu), remat=remat,
        )
    # as_identity: tokens pass straight through (reference perceiver.py:369-371)

    B = tokens.shape[0]
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(tokens.dtype)[None, None, :],
        (B, 1, tokens.shape[-1]),
    )
    h = jnp.concatenate([cls, tokens], axis=1)
    if cfg.use_orig_pos:
        h = h + p["positional_embedding"].astype(h.dtype)

    if train and cfg.patch_dropout > 0.0 and fps_key is not None:
        # train-time PatchDropout (reference transformer.py:53-90 + :770-771):
        # keep CLS + a uniformly-random subset of max(1, n*(1-prob)) patches.
        # Static keep-count -> static shapes under jit; fps_key doubles as
        # the tower's per-step stochastic-ops key (folded per device by the
        # train step).
        pd_key = jax.random.fold_in(fps_key, 17)
        cls_tok, patches = h[:, :1], h[:, 1:]
        n = patches.shape[1]
        keep = max(1, int(n * (1.0 - cfg.patch_dropout)))
        rand = jax.random.normal(pd_key, (B, n))
        idx = jax.lax.top_k(rand, keep)[1]
        patches = jnp.take_along_axis(patches, idx[..., None], axis=1)
        h = jnp.concatenate([cls_tok, patches], axis=1)

    h = L.layer_norm(h, p["ln_pre"])
    h = L.transformer(
        h, p["trunk"], cfg.arch.heads, L.get_act(cfg.quick_gelu),
        remat=remat, skip_first_n=cfg.skip_first_n_layers,
    )

    if cfg.arch.global_average_pool:
        pooled, toks = jnp.mean(h, axis=1), h
    else:
        pooled, toks = h[:, 0], h[:, 1:]
    pooled = L.layer_norm(pooled, p["ln_post"])
    pooled = pooled @ p["proj"].astype(pooled.dtype)

    new_s = {**s, "adapter": new_adapter_s}
    if output_tokens:
        return (pooled, toks), new_s
    return pooled, new_s
