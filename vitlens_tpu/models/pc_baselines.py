"""OpenShape point-cloud baseline encoders, TPU-native.

The reference OpenShape trainer can swap the CLIPBind Lens tower for a set
of comparison baselines (reference VitLens-OpenShape/src/models/__init__.py
:1-34): PointBERT/ppat (ppat.py:86-156), DGCNN (dgcnn.py:67-135), PointNet2
MSG (pointnet2.py:6-40 + pointnet_util.py:171-274) and a plain PointNet
(pointnet.py:5-21). This module carries all four as functional JAX models
(channel-last, dict params, explicit BatchNorm state) sharing the repo's
point ops (ops/fps.py FPS / ball-query / kNN — MXU-matmul distances).

Not carried, matching the reference's own tree: PointNeXt / PointMLP are
thin wrappers over a `models/PointNeXt` git submodule that is NOT vendored
in the reference (only the yaml configs exist), so — exactly like the
Minkowski models — they cannot run in the reference itself.

Layout conventions: xyz [B, N, 3] and features [B, N, C] channel-last
(the reference is channel-first and transposes internally, e.g.
ppat.py:117-121 Projected.forward). Pointwise Conv1d/Conv2d become plain
matmuls over the last axis.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.adapters.tokenizers import batch_norm, batch_norm_init
from vitlens_tpu.models.layers import (
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from vitlens_tpu.ops.fps import ball_query, fps_indices, knn_indices

Params = Dict[str, Any]
State = Dict[str, Any]


from vitlens_tpu.ops.fps import take_points as _take  # noqa: E402


# ---------------------------------------------------------------------------
# Shared pointwise-conv (+BN+act) stacks
# ---------------------------------------------------------------------------


def _conv_stack_init(key, in_ch: int, dims: Sequence[int],
                     bias: bool = True) -> Tuple[List[Params], List[State]]:
    ks = jax.random.split(key, len(dims))
    ps, ss = [], []
    last = in_ch
    for k, out in zip(ks, dims):
        # torch Conv uses kaiming_uniform on [out, in, 1(,1)] — fan_in = in
        p: Params = {"w": _conv_weight(k, last, out)}
        if bias:
            p["b"] = _conv_bias(jax.random.fold_in(k, 1), last, out)
        bn_p, bn_s = batch_norm_init(out)
        ps.append({"conv": p, "bn": bn_p})
        ss.append({"bn": bn_s})
        last = out
    return ps, ss


# torch Conv kaiming_uniform on [out, in, 1(,1)] == Linear default on the
# [in, out] layout — one shared implementation in models/layers.py
from vitlens_tpu.models.layers import (  # noqa: E402
    _bias_uniform as _conv_bias, _kaiming_uniform as _kw,
)


def _conv_weight(key, fan_in: int, out: int) -> jnp.ndarray:
    return _kw(key, (fan_in, out))


def _conv_stack_apply(
    ps: List[Params], ss: List[State], h: jnp.ndarray, train: bool,
    act: Callable = jax.nn.relu, bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, List[State]]:
    new_ss = []
    for p, s in zip(ps, ss):
        h = h @ p["conv"]["w"].astype(h.dtype)
        if "b" in p["conv"]:
            h = h + p["conv"]["b"].astype(h.dtype)
        h, bn_s = batch_norm(h, p["bn"], s["bn"], train, axis_name=bn_axis_name)
        h = act(h)
        new_ss.append({"bn": bn_s})
    return h, new_ss


# ---------------------------------------------------------------------------
# PointNet++ set abstraction (single-scale, MSG, group-all)
# Reference: pointnet_util.py:171-274
# ---------------------------------------------------------------------------


def sa_init(key, in_channel: int, mlp: Sequence[int]) -> Tuple[Params, State]:
    ps, ss = _conv_stack_init(key, in_channel, mlp)
    return {"mlp": ps}, {"mlp": ss}


def sa_apply(
    p: Params, s: State, xyz: jnp.ndarray, points: Optional[jnp.ndarray],
    *, npoint: Optional[int], radius: Optional[float], nsample: Optional[int],
    group_all: bool, train: bool = False,
    fps_start: Optional[jnp.ndarray] = None, fps_key=None,
    bn_axis_name: Optional[str] = None,
    knn_exact: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """PointNetSetAbstraction.forward (pointnet_util.py:186-213),
    channel-last. Returns (new_xyz [B,S,3], feat [B,S,C'], state)."""
    B, N, _ = xyz.shape
    if group_all:
        # sample_and_group_all (pointnet_util.py:150-168): xyz FIRST
        new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
        grouped = xyz[:, None, :, :]
        if points is not None:
            grouped = jnp.concatenate(
                [grouped, points[:, None, :, :]], axis=-1)
    else:
        idx_fps = fps_indices(xyz, npoint, start=fps_start, key=fps_key)
        new_xyz = _take(xyz, idx_fps)
        idx = ball_query(xyz, new_xyz, radius, nsample, exact=knn_exact)
        grouped_xyz = _take(xyz, idx) - new_xyz[:, :, None, :]
        if points is not None:
            # sample_and_group (pointnet_util.py:139-143): xyz-norm FIRST
            grouped = jnp.concatenate([grouped_xyz, _take(points, idx)], -1)
        else:
            grouped = grouped_xyz
    h, new_ss = _conv_stack_apply(p["mlp"], s["mlp"], grouped, train,
                                  bn_axis_name=bn_axis_name)
    feat = jnp.max(h, axis=2)  # max over the group/nsample axis
    return new_xyz, feat, {"mlp": new_ss}


def sa_msg_init(key, in_channel: int,
                mlp_list: Sequence[Sequence[int]]) -> Tuple[Params, State]:
    ks = jax.random.split(key, len(mlp_list))
    branches, states = [], []
    for k, mlp in zip(ks, mlp_list):
        ps, ss = _conv_stack_init(k, in_channel + 3, mlp)
        branches.append(ps)
        states.append(ss)
    return {"branches": branches}, {"branches": states}


def sa_msg_apply(
    p: Params, s: State, xyz: jnp.ndarray, points: Optional[jnp.ndarray],
    *, npoint: int, radius_list: Sequence[float],
    nsample_list: Sequence[int], train: bool = False,
    fps_start: Optional[jnp.ndarray] = None, fps_key=None,
    bn_axis_name: Optional[str] = None,
    knn_exact: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """PointNetSetAbstractionMsg.forward (pointnet_util.py:234-274)."""
    idx_fps = fps_indices(xyz, npoint, start=fps_start, key=fps_key)
    new_xyz = _take(xyz, idx_fps)
    feats, new_states = [], []
    for branch_p, branch_s, radius, k in zip(
            p["branches"], s["branches"], radius_list, nsample_list):
        idx = ball_query(xyz, new_xyz, radius, k, exact=knn_exact)
        grouped_xyz = _take(xyz, idx) - new_xyz[:, :, None, :]
        if points is not None:
            # MSG concatenates points FIRST, xyz-norm second
            # (pointnet_util.py:259) — opposite of single-scale SA.
            grouped = jnp.concatenate([_take(points, idx), grouped_xyz], -1)
        else:
            grouped = grouped_xyz
        h, new_ss = _conv_stack_apply(branch_p, branch_s, grouped, train,
                                      bn_axis_name=bn_axis_name)
        feats.append(jnp.max(h, axis=2))
        new_states.append(new_ss)
    return new_xyz, jnp.concatenate(feats, -1), {"branches": new_states}


# ---------------------------------------------------------------------------
# PPAT — PointPatchTransformer (PointBERT baseline). Reference ppat.py:86-156
# ---------------------------------------------------------------------------

# dim, depth, heads, mlp_dim, sa_dim, patches, prad, nsamp (ppat.py:126-156)
PPAT_SCALINGS = {
    1: dict(dim=256, depth=6, heads=4, mlp_dim=1024, sa_dim=96,
            patches=64, prad=0.4, nsamp=256),
    2: dict(dim=512, depth=6, heads=8, mlp_dim=1024, sa_dim=128,
            patches=64, prad=0.4, nsamp=256),
    3: dict(dim=512, depth=12, heads=8, mlp_dim=1024, sa_dim=128,
            patches=128, prad=0.35, nsamp=128),
    4: dict(dim=512, depth=12, heads=8, mlp_dim=512 * 3, sa_dim=256,
            patches=384, prad=0.2, nsamp=64),
    5: dict(dim=768, depth=12, heads=12, mlp_dim=768 * 3, sa_dim=256,
            patches=512, prad=0.2, nsamp=64),
    6: dict(dim=768, depth=24, heads=12, mlp_dim=768 * 4, sa_dim=256,
            patches=512, prad=0.2, nsamp=64),
}
PPAT_DIM_HEAD = 64  # ppat.py:30 dim_head default, never overridden


def _ppat_layer_init(key, dim: int, heads: int, mlp_dim: int) -> Params:
    inner = heads * PPAT_DIM_HEAD
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "attn": {
            "ln": layer_norm_init(dim),
            "qkv": linear_init(k1, dim, 3 * inner, bias=False),
            "out": linear_init(k2, inner, dim),
        },
        "ff": {
            "ln": layer_norm_init(dim),
            "fc": linear_init(k3, dim, mlp_dim),
            "proj": linear_init(k4, mlp_dim, dim),
        },
    }


def ppat_init(key, scaling: int, in_channel: int = 3,
              out_channel: int = 1280) -> Tuple[Params, State]:
    cfg = PPAT_SCALINGS[scaling]
    k_sa, k_lift, k_cls, k_tr, k_proj = jax.random.split(key, 5)
    sa_p, sa_s = sa_init(k_sa, in_channel + 3, [64, 64, cfg["sa_dim"]])
    layers = [
        _ppat_layer_init(k, cfg["dim"], cfg["heads"], cfg["mlp_dim"])
        for k in jax.random.split(k_tr, cfg["depth"])
    ]
    p: Params = {
        "sa": sa_p,
        "lift": {
            "conv": {
                "w": _conv_weight(k_lift, cfg["sa_dim"] + 3, cfg["dim"]),
                "b": _conv_bias(jax.random.fold_in(k_lift, 1),
                                cfg["sa_dim"] + 3, cfg["dim"]),
            },
            "ln": layer_norm_init(cfg["dim"]),
        },
        "cls_token": jax.random.normal(k_cls, (cfg["dim"],)),
        # scan-stacked transformer layers (repo convention, layers.py:185-192)
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "proj": linear_init(k_proj, cfg["dim"], out_channel),
    }
    return p, {"sa": sa_s}


def _ppat_attention(x: jnp.ndarray, p: Params, heads: int) -> jnp.ndarray:
    """ppat.py:29-64 Attention (rel_pe=False for every shipped scaling)."""
    B, n, _ = x.shape
    qkv = linear(x, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(B, n, heads, PPAT_DIM_HEAD).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (PPAT_DIM_HEAD ** -0.5)
    attn = jax.nn.softmax(dots, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, n, heads * PPAT_DIM_HEAD)
    return linear(o, p["out"])


def ppat_apply(
    p: Params, s: State, xyz: jnp.ndarray, features: jnp.ndarray,
    scaling: int, train: bool = False, patch_dropout: int = 0,
    fps_start: Optional[jnp.ndarray] = None, fps_key=None,
    bn_axis_name: Optional[str] = None,
    knn_exact: Optional[bool] = None,
) -> Tuple[jnp.ndarray, State]:
    """PointPatchTransformer + Projected head (ppat.py:99-121).

    xyz [B,N,3], features [B,N,in_channel] -> embeddings [B,out_channel].
    Train-time patch dropout shrinks the FPS patch count
    (ppat.py:101-103) — static, so it changes the compiled shape."""
    cfg = PPAT_SCALINGS[scaling]
    npoint = cfg["patches"] - (patch_dropout if train else 0)
    centroids, feat, sa_s = sa_apply(
        p["sa"], s["sa"], xyz, features, npoint=npoint, radius=cfg["prad"],
        nsample=cfg["nsamp"], group_all=False, train=train,
        fps_start=fps_start, fps_key=fps_key, bn_axis_name=bn_axis_name,
        knn_exact=knn_exact)

    lifted = jnp.concatenate([centroids.astype(feat.dtype), feat], -1)
    lifted = (lifted @ p["lift"]["conv"]["w"].astype(feat.dtype)
              + p["lift"]["conv"]["b"].astype(feat.dtype))
    x = layer_norm(lifted, p["lift"]["ln"])

    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype),
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)

    def body(carry, layer_p):
        h = carry + _ppat_attention(
            layer_norm(carry, layer_p["attn"]["ln"]), layer_p["attn"],
            cfg["heads"])
        ff = layer_p["ff"]
        y = linear(gelu(linear(layer_norm(h, ff["ln"]), ff["fc"])),
                   ff["proj"])
        return h + y, None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    return linear(x[:, 0], p["proj"]), {"sa": sa_s}


# ---------------------------------------------------------------------------
# DGCNN. Reference dgcnn.py:11-135
# ---------------------------------------------------------------------------


def dgcnn_init(key, in_channel: int = 3, out_channel: int = 256,
               scaling: int = 1) -> Tuple[Params, State]:
    base = int(64 * scaling)
    ks = jax.random.split(key, 8)
    p: Params = {}
    st: State = {}
    dims = [(in_channel * 2, base), (base * 2, base), (base * 2, base * 2),
            (base * 4, base * 4), (base * 8, base * 16)]
    for i, (cin, cout) in enumerate(dims, 1):
        bn_p, bn_s = batch_norm_init(cout)
        p[f"conv{i}"] = {"conv": {"w": _conv_weight(ks[i], cin, cout)},
                         "bn": bn_p}
        st[f"conv{i}"] = {"bn": bn_s}
    p["linear1"] = linear_init(ks[6], base * 32, base * 8, bias=False)
    p["bn6"], st["bn6"] = batch_norm_init(base * 8)
    p["linear2"] = linear_init(ks[7], base * 8, out_channel)
    return p, st


def _graph_feature(x: jnp.ndarray, k: int,
                   exact: Optional[bool] = None) -> jnp.ndarray:
    """get_graph_feature (dgcnn.py:14-39), channel-last: x [B,N,C] ->
    [B,N,k,2C] = cat([neighbor - x, x]). The kNN graph is NEAREST-neighbour
    (DGCNN paper semantics; the reference computes it through
    torch_redstone.Polyfill.cdist2 + topk, dgcnn.py:11)."""
    idx = knn_indices(x, x, k, exact=exact)  # [B,N,k], self included
    neigh = _take(x, idx)  # [B,N,k,C]
    center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


def dgcnn_apply(
    p: Params, s: State, xyz: jnp.ndarray, features: jnp.ndarray,
    train: bool = False, k: int = 20, knn_exact: Optional[bool] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    """DGCNN.forward (dgcnn.py:102-133). features [B,N,in_channel]."""
    leaky = lambda t: jax.nn.leaky_relu(t, 0.2)  # noqa: E731
    new_s: State = {}
    x = features
    feats = []
    for i in range(1, 5):
        g = _graph_feature(x, k, exact=knn_exact)
        h = g @ p[f"conv{i}"]["conv"]["w"].astype(g.dtype)
        h, bn_s = batch_norm(h, p[f"conv{i}"]["bn"], s[f"conv{i}"]["bn"],
                             train, axis_name=bn_axis_name)
        x = jnp.max(leaky(h), axis=2)  # [B,N,C_i]
        new_s[f"conv{i}"] = {"bn": bn_s}
        feats.append(x)

    h = jnp.concatenate(feats, axis=-1)  # [B,N,base*8]
    h = h @ p["conv5"]["conv"]["w"].astype(h.dtype)
    h, bn_s = batch_norm(h, p["conv5"]["bn"], s["conv5"]["bn"], train,
                         axis_name=bn_axis_name)
    h = leaky(h)
    new_s["conv5"] = {"bn": bn_s}

    pooled = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], -1)
    h = linear(pooled, p["linear1"])
    h, bn_s = batch_norm(h, p["bn6"], s["bn6"], train, axis_name=bn_axis_name)
    new_s["bn6"] = bn_s
    return linear(leaky(h), p["linear2"]), new_s


# ---------------------------------------------------------------------------
# PointNet2 MSG classifier. Reference pointnet2.py:6-40
# ---------------------------------------------------------------------------


def pointnet2_init(key, num_class: int,
                   normal_channel: bool = True) -> Tuple[Params, State]:
    in_ch = 3 if normal_channel else 0
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    sa1_p, sa1_s = sa_msg_init(
        k1, in_ch, [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
    sa2_p, sa2_s = sa_msg_init(
        k2, 320, [[64, 64, 128], [128, 128, 256], [128, 128, 256]])
    sa3_p, sa3_s = sa_init(k3, 640 + 3, [256, 512, 1024])
    p: Params = {"sa1": sa1_p, "sa2": sa2_p, "sa3": sa3_p,
                 "fc1": linear_init(k4, 1024, 512),
                 "fc2": linear_init(k5, 512, 256),
                 "fc3": linear_init(k6, 256, num_class)}
    p["bn1"], bn1_s = batch_norm_init(512)
    p["bn2"], bn2_s = batch_norm_init(256)
    return p, {"sa1": sa1_s, "sa2": sa2_s, "sa3": sa3_s,
               "bn1": bn1_s, "bn2": bn2_s}


def pointnet2_apply(
    p: Params, s: State, xyz: jnp.ndarray, normal_channel: bool = True,
    train: bool = False, fps_start: Optional[jnp.ndarray] = None,
    fps_key=None, bn_axis_name: Optional[str] = None,
    knn_exact: Optional[bool] = None,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
    """get_model.forward (pointnet2.py:22-40). xyz [B,N,3(+3 normals)]
    channel-last -> (log_softmax logits [B,num_class], l3 feat [B,1024])."""
    points = xyz[..., 3:] if normal_channel else None
    coords = xyz[..., :3]
    l1_xyz, l1_feat, sa1_s = sa_msg_apply(
        p["sa1"], s["sa1"], coords, points, npoint=512,
        radius_list=[0.1, 0.2, 0.4], nsample_list=[16, 32, 128], train=train,
        fps_start=fps_start, fps_key=fps_key, bn_axis_name=bn_axis_name,
        knn_exact=knn_exact)
    l2_xyz, l2_feat, sa2_s = sa_msg_apply(
        p["sa2"], s["sa2"], l1_xyz, l1_feat, npoint=128,
        radius_list=[0.2, 0.4, 0.8], nsample_list=[32, 64, 128], train=train,
        fps_start=fps_start, fps_key=fps_key, bn_axis_name=bn_axis_name,
        knn_exact=knn_exact)
    _, l3_feat, sa3_s = sa_apply(
        p["sa3"], s["sa3"], l2_xyz, l2_feat, npoint=None, radius=None,
        nsample=None, group_all=True, train=train, bn_axis_name=bn_axis_name)
    h = l3_feat[:, 0]  # [B, 1024]
    h, bn1_s = batch_norm(linear(h, p["fc1"]), p["bn1"], s["bn1"], train,
                          axis_name=bn_axis_name)
    h = jax.nn.relu(h)
    h, bn2_s = batch_norm(linear(h, p["fc2"]), p["bn2"], s["bn2"], train,
                          axis_name=bn_axis_name)
    h = jax.nn.relu(h)
    logits = jax.nn.log_softmax(linear(h, p["fc3"]), axis=-1)
    return (logits, l3_feat[:, 0]), {
        "sa1": sa1_s, "sa2": sa2_s, "sa3": sa3_s,
        "bn1": bn1_s, "bn2": bn2_s}


# ---------------------------------------------------------------------------
# Plain PointNet. Reference pointnet.py:5-21 — built on torch_redstone.MLP
# (pointwise layers + BatchNorm + ReLU). torch_redstone is not importable in
# this image (so the reference model cannot run here either); this is a
# spec-equivalent rebuild: each rst.MLP stage = pointwise linear + BN + ReLU.
# ---------------------------------------------------------------------------


def pointnet_init(key, in_channel: int = 3, out_channel: int = 1280,
                  scaling: int = 1) -> Tuple[Params, State]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lift1, lift1_s = _conv_stack_init(k1, in_channel, [64, 64])
    lift2, lift2_s = _conv_stack_init(
        k2, 64, [64 * scaling, 128 * scaling, 1024 * scaling])
    top, top_s = _conv_stack_init(k3, 1024 * scaling, [512 * scaling])
    return (
        {"lift1": lift1, "lift2": lift2, "top": top,
         "head": linear_init(k4, 512 * scaling, out_channel)},
        {"lift1": lift1_s, "lift2": lift2_s, "top": top_s},
    )


def pointnet_apply(
    p: Params, s: State, xyz: jnp.ndarray, features: jnp.ndarray,
    train: bool = False, bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, State]:
    h, l1_s = _conv_stack_apply(p["lift1"], s["lift1"], features, train,
                                bn_axis_name=bn_axis_name)
    h, l2_s = _conv_stack_apply(p["lift2"], s["lift2"], h, train,
                                bn_axis_name=bn_axis_name)
    h = jnp.max(h, axis=1)  # global max pool over points
    h, top_s = _conv_stack_apply(p["top"], s["top"], h, train,
                                 bn_axis_name=bn_axis_name)
    return linear(h, p["head"]), {"lift1": l1_s, "lift2": l2_s, "top": top_s}


# ---------------------------------------------------------------------------
# Factory mirroring reference models/__init__.py::make
# ---------------------------------------------------------------------------


def make_pc_baseline(name: str, *, in_channel: int = 6,
                     out_channel: int = 1280, scaling: int = 3):
    """Returns (init_fn(key) -> (params, state),
    apply_fn(params, state, xyz, features, **kw) -> (emb, state)).

    Mirrors VitLens-OpenShape/src/models/__init__.py:4-34. `PointBERT` is
    the ppat PointPatchTransformer; Minkowski / PointNeXt / PointMLP raise,
    matching the reference tree where their code is commented out / not
    vendored."""
    if name == "PointBERT":
        return (
            lambda key: ppat_init(key, scaling, in_channel, out_channel),
            lambda p, s, xyz, feats, **kw: ppat_apply(
                p, s, xyz, feats, scaling, **kw),
        )
    if name == "DGCNN":
        return (
            lambda key: dgcnn_init(key, in_channel, out_channel, scaling),
            dgcnn_apply,
        )
    if name == "PointNet":
        return (
            lambda key: pointnet_init(key, in_channel, out_channel, scaling),
            pointnet_apply,
        )
    if name == "PointNet2":
        # The reference trainer's make() has no PointNet2 branch either
        # (models/__init__.py:4-34): pointnet2.py is a ModelNet CLASSIFIER
        # (returns (log_softmax logits, l3 feat), not a 1280-d contrastive
        # embedding). Use pointnet2_init/pointnet2_apply directly for
        # classification; it has no bind surface.
        raise NotImplementedError(
            "PointNet2 is a classification baseline (pointnet2_apply), not "
            "a contrastive encoder — the reference trainer cannot bind it "
            "either (models/__init__.py:4-34).")
    raise NotImplementedError(
        f"pc baseline {name!r} not supported. Minkowski is disabled in the "
        "reference itself; PointNeXt/PointMLP wrap a git submodule the "
        "reference does not vendor.")
