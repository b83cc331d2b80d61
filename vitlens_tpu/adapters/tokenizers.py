"""Modality adapters: raw modality tensors -> (tokens, pos) for the Lens.

TPU-first re-design of the reference "visual adapters"
(/root/reference/vitlens/src/open_clip/visual_adapter.py:7-69 and the
per-modality tokenizer modules it dispatches to). All 1x1 convs are expressed
as matmuls (MXU), patch-embed convs with stride==kernel are patchify+matmul,
and the only real convolution (overlapping AST patches) uses
lax.conv_general_dilated which XLA maps onto the MXU.

Each adapter is a pair of functions:
    *_init(key, cfg)                    -> (params, state)
    *_apply(params, state, x, train)    -> (tokens[, pos]), new_state
`state` carries BatchNorm running statistics (only the point tokenizers have
any); everything else returns its state unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.config import (
    AudioAdapterConfig,
    EEGAdapterConfig,
    PointAdapterConfig,
    TowerConfig,
)
from vitlens_tpu.models.layers import (
    _kaiming_uniform,
    _bias_uniform,
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from vitlens_tpu.ops.fps import (ball_query, fps, group_points,
                                 take_points)

Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# BatchNorm (functional, stats in `state`)
# ---------------------------------------------------------------------------


def batch_norm_init(dim: int) -> Tuple[Params, State]:
    return (
        {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))},
    )


def batch_norm(
    x: jnp.ndarray,
    p: Params,
    s: State,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over all axes but the last (channel-last layout).

    With `axis_name` set, batch statistics are pmean'd over that mesh axis —
    the TPU equivalent of SyncBatchNorm (reference audio_main.py:346-347)."""
    if train:
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x32, axis=axes)
        ex2 = jnp.mean(jnp.square(x32), axis=axes)
        n = 1
        for a in axes:
            n *= x.shape[a]
        if axis_name is not None:
            # sync the MOMENTS, not per-shard variances: pmean of locally-
            # centered variances is E[x^2] - avg_i(m_i^2) <= true global
            # variance whenever shard means differ (torch SyncBatchNorm
            # computes global mean/var — reference audio_main.py:346-347)
            mean = jax.lax.pmean(mean, axis_name)
            ex2 = jax.lax.pmean(ex2, axis_name)
            n = n * jax.lax.axis_size(axis_name)  # static: global count
        var = ex2 - jnp.square(mean)
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_s


# ---------------------------------------------------------------------------
# Patch embedding via patchify + matmul (stride == kernel convs)
# ---------------------------------------------------------------------------


def patchify_2d(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] with (c, ph, pw) flattening
    order, exactly matching a conv with kernel=stride=patch."""
    B, C, H, W = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, gh * gw, C * patch * patch)


def patch_embed_init(key, in_ch: int, patch: int, width: int) -> Params:
    """Weight layout [C*p*p, width] (converter transposes the torch conv)."""
    std = (in_ch * patch * patch) ** -0.5  # fan-in-ish; parity comes from ckpt
    return {"w": std * jax.random.normal(key, (in_ch * patch * patch, width))}


def patch_embed(x: jnp.ndarray, p: Params, patch: int) -> jnp.ndarray:
    return patchify_2d(x, patch) @ p["w"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Image / tactile (plain conv patch path — reference transformer.py:451-470)
# ---------------------------------------------------------------------------


def image_adapter_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    return {"conv1": patch_embed_init(key, 3, cfg.arch.patch_size, cfg.arch.width)}, {}


def image_adapter_apply(
    p: Params, s: State, x: jnp.ndarray, train: bool = False
) -> Tuple[Tuple[jnp.ndarray, None], State]:
    """[B,3,H,W] -> tokens [B, grid^2, width]; no adapter pos (the ViT's own
    positional embedding covers the image path)."""
    del train
    patch = int(math.isqrt(p["conv1"]["w"].shape[0] // 3))
    return (patch_embed(x, p["conv1"], patch), None), s


# ---------------------------------------------------------------------------
# Depth (1-channel patch embed + own pos — modal_depth/models/DepthTokenizer.py)
# ---------------------------------------------------------------------------


def depth_adapter_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    k1, k2 = jax.random.split(key)
    width = cfg.arch.width
    scale = width ** -0.5
    return (
        {
            "conv1": patch_embed_init(k1, 1, cfg.arch.patch_size, width),
            "pos_emb": scale * jax.random.normal(k2, (cfg.arch.num_patches, width)),
        },
        {},
    )


def depth_adapter_apply(
    p: Params, s: State, x: jnp.ndarray, train: bool = False
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
    del train
    patch = int(math.isqrt(p["conv1"]["w"].shape[0]))
    tokens = patch_embed(x, p["conv1"], patch)
    return (tokens, p["pos_emb"]), s


# ---------------------------------------------------------------------------
# Audio: AST-style overlapping patch conv (modal_audio/models/AST_tokenizer.py)
# ---------------------------------------------------------------------------


def audio_adapter_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    a = cfg.audio
    width = cfg.arch.width
    k1, k2 = jax.random.split(key)
    # conv weight kept in conv layout [width, 1, p, p] for the strided conv
    std = (a.patch_size * a.patch_size) ** -0.5
    return (
        {
            "conv1": {"w": std * jax.random.normal(k1, (width, 1, a.patch_size, a.patch_size))},
            "pos_emb": (width ** -0.5)
            * jax.random.normal(k2, (a.num_patches, width)),
        },
        {},
    )


def audio_adapter_apply(
    p: Params,
    s: State,
    x: jnp.ndarray,
    cfg: AudioAdapterConfig,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
    """x: [B, T(target_length), F(mel_bins)] log-mel fbank.

    Reference AST forward: unsqueeze channel, transpose to [B,1,F,T], conv
    kernel (p,p) stride (fstride,tstride), flatten (f,t) -> tokens."""
    del train
    x = x[:, None, :, :].transpose(0, 1, 3, 2)  # [B,1,F,T]
    w = p["conv1"]["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(cfg.fstride, cfg.tstride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [B, width, fdim, tdim]
    B, W, fd, td = y.shape
    tokens = y.reshape(B, W, fd * td).transpose(0, 2, 1)
    return (tokens, p["pos_emb"]), s


# ---------------------------------------------------------------------------
# EEG: Conv1d patch embed (modal_eeg/models/EEG_tokenizer.py)
# ---------------------------------------------------------------------------


def eeg_adapter_init(key, cfg: TowerConfig) -> Tuple[Params, State]:
    e = cfg.eeg
    width = cfg.arch.width
    k1, k2, k3 = jax.random.split(key, 3)
    fan_in = e.chans * e.window_size
    return (
        {
            # layout [chans*window, width] — CHANS-major, matching both the
            # unfold reshape below ([B,n,chans,window].reshape) and torch
            # Conv1d's [out, in_ch*k] flattening; window_size=1 -> matmul
            "proj": {
                "w": _kaiming_uniform(k1, (fan_in, width)),
                "b": _bias_uniform(k2, fan_in, width),
            },
            "pos_emb": (width ** -0.5)
            * jax.random.normal(k3, (e.num_patches, width)),
        },
        {},
    )


def eeg_adapter_apply(
    p: Params,
    s: State,
    x: jnp.ndarray,
    cfg: EEGAdapterConfig,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
    """x: [B, chans, time]. With the released config (window=1, stride=1)
    the Conv1d is a pointwise matmul over channels."""
    del train
    if cfg.window_size == 1 and cfg.stride == 1:
        tokens = x.transpose(0, 2, 1) @ p["proj"]["w"].astype(x.dtype)
        tokens = tokens + p["proj"]["b"].astype(x.dtype)
    else:
        # unfold windows: [B, n_patches, chans*window]
        n = cfg.num_patches
        starts = jnp.arange(n) * cfg.stride
        windows = jax.vmap(
            lambda st: jax.lax.dynamic_slice_in_dim(x, st, cfg.window_size, axis=2),
            out_axes=1,
        )(starts)  # [B, n, chans, window]
        flat = windows.reshape(x.shape[0], n, -1)
        tokens = flat @ p["proj"]["w"].astype(x.dtype) + p["proj"]["b"].astype(x.dtype)
    return (tokens, p["pos_emb"]), s


# ---------------------------------------------------------------------------
# Point cloud: PointBERT mini-PointNet tokenizer
# (modal_3d/models/pointbert/point_encoder.py:299-362, dvae.py:143-212)
# ---------------------------------------------------------------------------


def _pointwise_conv_init(key, d_in: int, d_out: int) -> Params:
    """Conv1d kernel-1 == matmul; torch default init."""
    k1, k2 = jax.random.split(key)
    return {
        "w": _kaiming_uniform(k1, (d_in, d_out)),
        "b": _bias_uniform(k2, d_in, d_out),
    }


def point_tokenizer_init(key, cfg: PointAdapterConfig) -> Tuple[Params, State]:
    ks = jax.random.split(key, 8)
    p: Params = {
        "encoder": {
            "conv1": _pointwise_conv_init(ks[0], 3, 128),
            "conv2": _pointwise_conv_init(ks[1], 128, 256),
            "conv3": _pointwise_conv_init(ks[2], 512, 512),
            "conv4": _pointwise_conv_init(ks[3], 512, cfg.encoder_dims),
        },
        "reduce_dim": linear_init(ks[4], cfg.encoder_dims, cfg.trans_dim),
        "pos_embed": {
            "fc1": linear_init(ks[5], 3, 128),
            "fc2": linear_init(ks[6], 128, cfg.trans_dim),
        },
    }
    bn1_p, bn1_s = batch_norm_init(128)
    bn2_p, bn2_s = batch_norm_init(512)
    p["encoder"]["bn1"] = bn1_p
    p["encoder"]["bn2"] = bn2_p
    s: State = {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}
    return p, s


def point_tokenizer_apply(
    p: Params,
    s: State,
    pts: jnp.ndarray,
    cfg: PointAdapterConfig,
    train: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
    """pts [B, N, 3] -> (tokens [B, G, trans_dim], pos [B, G, trans_dim]).

    Pipeline (mirrors reference): FPS centers + kNN groups, center-normalise;
    per-group mini-PointNet (pointwise matmuls + max-pool + global concat);
    reduce_dim linear; pos = MLP(center)."""
    enc = p["encoder"]
    neighborhood, center = group_points(
        pts, cfg.num_group, cfg.group_size, key=fps_key,
        knn_exact=cfg.knn_exact,
    )  # [B,G,M,3], [B,G,3]

    if not train:
        from vitlens_tpu.ops import fused_point_encoder as fpe

        if (fpe.point_encoder_available()
                and fpe.point_encoder_applicable(neighborhood, enc)):
            # whole mini-PointNet in one VMEM-resident Pallas pass (eval
            # BN); numerics-parity vs the XLA path below in
            # tests/test_fused_point_encoder.py
            feat = fpe.fused_point_encoder(neighborhood, enc, s["encoder"])
            tokens = linear(feat, p["reduce_dim"])
            pos = linear(
                gelu(linear(center.astype(tokens.dtype),
                            p["pos_embed"]["fc1"])),
                p["pos_embed"]["fc2"])
            return (tokens, pos), s

    h = neighborhood @ enc["conv1"]["w"].astype(pts.dtype) + enc["conv1"]["b"].astype(pts.dtype)
    h, bn1_s = batch_norm(h, enc["bn1"], s["encoder"]["bn1"], train, axis_name=bn_axis_name)
    h = jax.nn.relu(h)
    h = h @ enc["conv2"]["w"].astype(pts.dtype) + enc["conv2"]["b"].astype(pts.dtype)  # [B,G,M,256]
    g = jnp.max(h, axis=2, keepdims=True)  # [B,G,1,256]
    # Reference computes cat([g.expand(M), h], -1) @ W3 (dvae.py Encoder).
    # By distributivity that is g @ W3[:256] + h @ W3[256:], exactly —
    # which never materialises the [B,G,M,512] concat (~1 GB HBM at B64)
    # and runs the global half on [B,G,1,·] rows (1/M the flops), so
    # conv3's row-major work halves. Accumulation still fp32 per output.
    # fp32 partials so the split reduction rounds ONCE like the reference's
    # single 512-deep accumulate (bf16 partial outputs would add a second
    # rounding before the sum)
    w3 = enc["conv3"]["w"].astype(pts.dtype)
    d2 = h.shape[-1]
    h32 = (jnp.matmul(h, w3[d2:], preferred_element_type=jnp.float32)
           + jnp.matmul(g, w3[:d2], preferred_element_type=jnp.float32)
           + enc["conv3"]["b"].astype(jnp.float32))
    h = h32.astype(pts.dtype)
    h, bn2_s = batch_norm(h, enc["bn2"], s["encoder"]["bn2"], train, axis_name=bn_axis_name)
    h = jax.nn.relu(h)
    h = h @ enc["conv4"]["w"].astype(pts.dtype) + enc["conv4"]["b"].astype(pts.dtype)
    feat = jnp.max(h, axis=2)  # [B,G,encoder_dims]

    tokens = linear(feat, p["reduce_dim"])
    pos = linear(gelu(linear(center.astype(tokens.dtype), p["pos_embed"]["fc1"])),
                 p["pos_embed"]["fc2"])
    new_s = {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}
    return (tokens, pos), new_s


# ---------------------------------------------------------------------------
# Point cloud: PNSA tokenizer (OpenShape/vitlensG path —
# modal_3d/models/pointnet/pointnet_util.py:184-228, :345+)
# ---------------------------------------------------------------------------


def pnsa_tokenizer_init(key, cfg: PointAdapterConfig) -> Tuple[Params, State]:
    mlp_dims = [64, 64, cfg.encoder_dims]
    ks = jax.random.split(key, len(mlp_dims) + 2)
    last = cfg.in_channel + 3
    convs, states = [], []
    for i, out in enumerate(mlp_dims):
        conv = _pointwise_conv_init(ks[i], last, out)
        bn_p, bn_s = batch_norm_init(out)
        convs.append({"conv": conv, "bn": bn_p})
        states.append({"bn": bn_s})
        last = out
    p: Params = {
        "sa": convs,
        "lift": {
            "conv": _pointwise_conv_init(ks[-2], cfg.encoder_dims + 3, cfg.trans_dim),
            "ln": layer_norm_init(cfg.trans_dim),
        },
    }
    return p, {"sa": states}


def pnsa_tokenizer_apply(
    p: Params,
    s: State,
    features: jnp.ndarray,
    xyz: jnp.ndarray,
    cfg: PointAdapterConfig,
    train: bool = False,
    fps_key: Optional[jax.Array] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[Tuple[jnp.ndarray, None], State]:
    """features [B,N,D] (e.g. xyz+rgb), xyz [B,N,3] -> tokens [B,G,trans_dim].

    Set-abstraction: FPS centers, ball-query groups (radius cfg.radius),
    [grouped_xyz - center ; grouped_features] -> shared MLP + max-pool,
    then lift [center ; feat] -> trans_dim + LayerNorm."""
    new_xyz = fps(xyz, cfg.num_group, key=fps_key)  # [B,G,3]
    idx = ball_query(xyz, new_xyz, cfg.radius, cfg.group_size,
                     exact=cfg.knn_exact)  # [B,G,M]
    # One gather over [xyz ; features] instead of two: identical math
    # channel-by-channel (bit-exact), one pass over the gathered blocks on
    # the TPU blocked-one-hot path (see ops/fps.py::take_points).
    cat_dt = jnp.promote_types(xyz.dtype, features.dtype)
    grouped = take_points(
        jnp.concatenate([xyz.astype(cat_dt), features.astype(cat_dt)],
                        axis=-1), idx)
    grouped_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
    h = jnp.concatenate([grouped_xyz, grouped[..., 3:]], axis=-1)

    new_states = []
    for layer_p, layer_s in zip(p["sa"], s["sa"]):
        h = h @ layer_p["conv"]["w"].astype(h.dtype) + layer_p["conv"]["b"].astype(h.dtype)
        h, bn_s = batch_norm(h, layer_p["bn"], layer_s["bn"], train, axis_name=bn_axis_name)
        h = jax.nn.relu(h)
        new_states.append({"bn": bn_s})
    feat = jnp.max(h, axis=2)  # [B,G,encoder_dims]

    lifted = jnp.concatenate([new_xyz.astype(feat.dtype), feat], axis=-1)
    lifted = lifted @ p["lift"]["conv"]["w"].astype(feat.dtype) + p["lift"]["conv"]["b"].astype(feat.dtype)
    tokens = layer_norm(lifted, p["lift"]["ln"])
    return (tokens, None), {"sa": new_states}
