"""PyTorch checkpoint -> vitlens-tpu pytree conversion.

Handles the reference checkpoint family (reference key semantics documented at
factory.py:130-160 load_checkpoint, model.py:1079-1146 resize_pos_embed,
vitlens.py:121-151 per-modality extraction):
  * open_clip CLIP / TriCLIP state dicts (datacomp ViT-L trunk, vitlensL*.pt)
  * "module." DDP prefix stripping
  * "visual.*" -> "image.*" dual-keying for tri models
  * bicubic pos-emb grid -> perceiver-latent resize

Weight-layout remaps (torch -> ours):
  * Linear weight [out, in]      -> w [in, out]        (transpose)
  * MHA in_proj_weight [3D, D]   -> qkv_w [D, 3D]      (transpose)
  * Conv kernel=stride patch conv [W, C, p, p] -> [C*p*p, W]
  * Conv1d kernel-1 [out, in, 1] -> [in, out]
  * per-layer block tensors stacked along a leading [layers] axis (lax.scan)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

import jax.numpy as jnp

from vitlens_tpu.config import ModelConfig, PerceiverConfig, TowerConfig, image_tower_config

Params = Dict[str, Any]
State = Dict[str, Any]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def _j(t) -> jnp.ndarray:
    return jnp.asarray(_np(t), dtype=jnp.float32)


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip DDP 'module.' prefix (reference factory.py:125-127)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def sub(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


def _ln(sd: Mapping[str, Any], name: str) -> Params:
    return {"scale": _j(sd[f"{name}.weight"]), "bias": _j(sd[f"{name}.bias"])}


def _linear(sd: Mapping[str, Any], name: str) -> Params:
    p = {"w": _j(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _conv1x1(sd: Mapping[str, Any], name: str) -> Params:
    """Conv1d kernel-1 -> matmul params."""
    w = _np(sd[f"{name}.weight"])  # [out, in, 1]
    p = {"w": jnp.asarray(w[..., 0].T, jnp.float32)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _bn(sd: Mapping[str, Any], name: str) -> Tuple[Params, State]:
    return (
        {"scale": _j(sd[f"{name}.weight"]), "bias": _j(sd[f"{name}.bias"])},
        {"mean": _j(sd[f"{name}.running_mean"]), "var": _j(sd[f"{name}.running_var"])},
    )


def _stack(layers):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def convert_transformer_blocks(sd: Mapping[str, Any], n_layers: int) -> Params:
    """resblocks.* -> stacked trunk params."""
    per_layer = []
    for i in range(n_layers):
        pre = f"resblocks.{i}."
        blk = {
            "ln_1": _ln(sd, f"{pre}ln_1"),
            "attn": {
                "qkv_w": _j(sd[f"{pre}attn.in_proj_weight"]).T,
                "qkv_b": _j(sd[f"{pre}attn.in_proj_bias"]),
                "out_w": _j(sd[f"{pre}attn.out_proj.weight"]).T,
                "out_b": _j(sd[f"{pre}attn.out_proj.bias"]),
            },
            "ln_2": _ln(sd, f"{pre}ln_2"),
            "mlp": {
                "fc": _linear(sd, f"{pre}mlp.c_fc"),
                "proj": _linear(sd, f"{pre}mlp.c_proj"),
            },
        }
        if f"{pre}ls_1.gamma" in sd:
            blk["ls_1"] = {"gamma": _j(sd[f"{pre}ls_1.gamma"])}
            blk["ls_2"] = {"gamma": _j(sd[f"{pre}ls_2.gamma"])}
        per_layer.append(blk)
    return {"blocks": _stack(per_layer)}


def convert_perceiver(sd: Mapping[str, Any], cfg: PerceiverConfig) -> Params:
    p: Params = {"latents": _j(sd["latents"])}
    layers = []
    n_unique = 1 if cfg.weight_tie_layers else cfg.depth
    for i in range(n_unique):
        layer: Params = {
            "cross_attn": {
                "ln_q": _ln(sd, f"layers.{i}.0.norm"),
                "ln_kv": _ln(sd, f"layers.{i}.0.norm_context"),
                "attn": {
                    "to_q": _linear(sd, f"layers.{i}.0.fn.to_q"),
                    "to_kv": _linear(sd, f"layers.{i}.0.fn.to_kv"),
                    "to_out": _linear(sd, f"layers.{i}.0.fn.to_out"),
                },
            },
            "cross_ff": {
                "ln": _ln(sd, f"layers.{i}.1.norm"),
                "ff": {
                    "fc": _linear(sd, f"layers.{i}.1.fn.net.0"),
                    "proj": _linear(sd, f"layers.{i}.1.fn.net.2"),
                },
            },
            "self_blocks": [],
        }
        for j in range(cfg.self_per_cross_attn):
            layer["self_blocks"].append({
                "attn_ln": _ln(sd, f"layers.{i}.2.{j}.0.norm"),
                "attn": {
                    "to_q": _linear(sd, f"layers.{i}.2.{j}.0.fn.to_q"),
                    "to_kv": _linear(sd, f"layers.{i}.2.{j}.0.fn.to_kv"),
                    "to_out": _linear(sd, f"layers.{i}.2.{j}.0.fn.to_out"),
                },
                "ff_ln": _ln(sd, f"layers.{i}.2.{j}.1.norm"),
                "ff": {
                    "fc": _linear(sd, f"layers.{i}.2.{j}.1.fn.net.0"),
                    "proj": _linear(sd, f"layers.{i}.2.{j}.1.fn.net.2"),
                },
            })
        layers.append(layer)
    p["layers"] = layers
    return p


def _convert_adapter(sd: Mapping[str, Any], cfg: TowerConfig) -> Tuple[Params, State]:
    m = cfg.modality
    if m in ("image", "tactile", "video"):
        w = _np(sd["conv1.weight"])  # [W, 3, p, p]
        p: Params = {"conv1": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T,
                                                jnp.float32)}}
        if "ltpos.weight" in sd:  # video learned temporal pos
            p["ltpos"] = _j(sd["ltpos.weight"])
        return p, {}
    if m == "depth":
        a = sub(sd, "visual_adapter.")
        w = _np(a["conv1.weight"])  # [W, 1, p, p]
        return (
            {
                "conv1": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, jnp.float32)},
                "pos_emb": _j(a["pos_emb"]),
            },
            {},
        )
    if m == "audio":
        a = sub(sd, "visual_adapter.")
        return (
            {"conv1": {"w": _j(a["conv1.weight"])}, "pos_emb": _j(a["pos_emb"])},
            {},
        )
    if m == "eeg":
        a = sub(sd, "visual_adapter.")
        w = _np(a["proj.weight"])  # [W, chans, k]
        # our layout flattens (chans, window) -> [chans*k, W]
        wf = w.reshape(w.shape[0], -1).T
        return (
            {
                "proj": {"w": jnp.asarray(wf, jnp.float32), "b": _j(a["proj.bias"])},
                "pos_emb": _j(a["pos_emb"]),
            },
            {},
        )
    if m == "pc":
        a = sub(sd, "visual_adapter.")
        if cfg.point.tokenizer == "pointbert":
            bn1_p, bn1_s = _bn(a, "encoder.first_conv.1")
            bn2_p, bn2_s = _bn(a, "encoder.second_conv.1")
            p = {
                "encoder": {
                    "conv1": _conv1x1(a, "encoder.first_conv.0"),
                    "bn1": bn1_p,
                    "conv2": _conv1x1(a, "encoder.first_conv.3"),
                    "conv3": _conv1x1(a, "encoder.second_conv.0"),
                    "bn2": bn2_p,
                    "conv4": _conv1x1(a, "encoder.second_conv.3"),
                },
                "reduce_dim": _linear(a, "reduce_dim"),
                "pos_embed": {
                    "fc1": _linear(a, "pos_embed.0"),
                    "fc2": _linear(a, "pos_embed.2"),
                },
            }
            return p, {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}
        else:  # pnsa
            convs, states = [], []
            for i in range(3):
                bn_p, bn_s = _bn(a, f"sa.mlp_bns.{i}")
                w = _np(a[f"sa.mlp_convs.{i}.weight"])  # [out, in, 1, 1]
                conv = {
                    "w": jnp.asarray(w[..., 0, 0].T, jnp.float32),
                    "b": _j(a[f"sa.mlp_convs.{i}.bias"]),
                }
                convs.append({"conv": conv, "bn": bn_p})
                states.append({"bn": bn_s})
            p = {
                "sa": convs,
                "lift": {
                    "conv": _conv1x1(a, "lift.0"),
                    "ln": _ln(a, "lift.2"),
                },
            }
            return p, {"sa": states}
    raise NotImplementedError(m)


def resize_pos_embed(
    pos: np.ndarray, target_len: int
) -> np.ndarray:
    """Bicubic-resize a [1+g*g, D] CLIP pos-emb to [1+target, D].

    Reference model.py:1079-1146: CLS row kept, grid rows reshaped to
    [g, g, D], bicubic-interpolated to the new (square) grid, reflattened."""
    n = pos.shape[0] - 1
    if n == target_len:
        return pos
    import jax

    g_old = int(round(n ** 0.5))
    g_new = int(round(target_len ** 0.5))
    assert g_old * g_old == n and g_new * g_new == target_len, (n, target_len)
    cls_row, grid = pos[:1], pos[1:]
    grid = grid.reshape(g_old, g_old, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (g_new, g_new, grid.shape[-1]), method="bicubic"
    )
    return np.concatenate([cls_row, np.asarray(resized).reshape(g_new * g_new, -1)], 0)


def convert_vision_tower(
    sd: Mapping[str, Any], cfg: TowerConfig
) -> Tuple[Params, State]:
    """Convert one VisionTransformer state-dict subtree (keys relative to the
    tower, e.g. after sub(sd, 'visual.'))."""
    adapter_p, adapter_s = _convert_adapter(sd, cfg)
    pos = _np(sd["positional_embedding"])
    pos = resize_pos_embed(pos, cfg.num_tokens)
    p: Params = {
        "adapter": adapter_p,
        "class_embedding": _j(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(pos, jnp.float32),
        "ln_pre": _ln(sd, "ln_pre"),
        "trunk": convert_transformer_blocks(sub(sd, "transformer."), cfg.arch.layers),
        "ln_post": _ln(sd, "ln_post"),
        "proj": _j(sd["proj"]),
    }
    if cfg.perceiver is not None and not (
        cfg.perceiver.as_identity or cfg.perceiver.as_transformer
    ):
        p["perceiver"] = convert_perceiver(sub(sd, "perceiver."), cfg.perceiver)
    elif cfg.perceiver is not None and cfg.perceiver.as_transformer:
        # perceiver_as_transformer: a plain Transformer named "perceiver"
        p["perceiver_transformer"] = convert_transformer_blocks(
            sub(sd, "perceiver."), cfg.perceiver.depth)
    return p, {"adapter": adapter_s}


def convert_shared_vision_subset(sd: Mapping[str, Any], cfg: TowerConfig) -> Params:
    """Plain-CLIP visual keys -> the subset a Lens tower shares with an image
    tower: trunk blocks, ln_pre/ln_post, proj, class_embedding and the
    (latent-resized) positional embedding. Adapter/perceiver params are NOT
    produced and stay at their random init after the non-strict merge.

    Reference behavior: tri models load plain CLIP checkpoints non-strict
    (factory.py:138-160), so published train-from-CLIP recipes start the Lens
    tower from the pretrained frozen trunk rather than random weights."""
    pos = resize_pos_embed(_np(sd["positional_embedding"]), cfg.num_tokens)
    p: Params = {
        "class_embedding": _j(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(pos, jnp.float32),
        "ln_pre": _ln(sd, "ln_pre"),
        "trunk": convert_transformer_blocks(sub(sd, "transformer."), cfg.arch.layers),
        "ln_post": _ln(sd, "ln_post"),
        "proj": _j(sd["proj"]),
    }
    # image-patch-path modalities share the RGB patch conv too
    if cfg.modality in ("image", "tactile", "video") and "conv1.weight" in sd:
        w = _np(sd["conv1.weight"])  # [W, 3, p, p]
        p["adapter"] = {
            "conv1": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, jnp.float32)}
        }
    return p


def convert_text_tower(sd: Mapping[str, Any], n_layers: int) -> Params:
    """Convert text keys (either TriCLIP inline — token_embedding.* at top
    level — or a TextTransformer subtree)."""
    return {
        "token_embedding": _j(sd["token_embedding.weight"]),
        "positional_embedding": _j(sd["positional_embedding"]),
        "trunk": convert_transformer_blocks(sub(sd, "transformer."), n_layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _j(sd["text_projection"]),
    }


def convert_hf_text_tower(sd: Mapping[str, Any]) -> Params:
    """Convert an open_clip HFTextEncoder subtree (keys under `text.`:
    transformer.* = the HF module, proj = Identity/Linear/Sequential —
    reference hf_model.py:160-176) onto the models/bert_text.py pytree."""
    from vitlens_tpu.models.bert_text import convert_hf_bert_state_dict

    out: Params = {
        "encoder": convert_hf_bert_state_dict(sub(sd, "transformer.")),
    }
    if "proj.0.weight" in sd:  # mlp: Sequential(Linear, GELU, Linear)
        out["proj"] = {"fc1": {"w": _j(sd["proj.0.weight"]).T},
                       "fc2": {"w": _j(sd["proj.2.weight"]).T}}
    elif "proj.weight" in sd:  # linear
        out["proj"] = {"fc": {"w": _j(sd["proj.weight"]).T}}
    return out


def convert_tri_state_dict(
    sd: Mapping[str, Any], cfg: ModelConfig
) -> Tuple[Params, State]:
    """Full TriCLIP state dict -> (params, state).

    Handles plain two-tower CLIP checkpoints too: if there is no 'image.'
    subtree, 'visual.' keys are dual-used for both towers (the reference
    'hack', factory.py:143-154)."""
    sd = strip_prefixes(sd)
    has_image = any(k.startswith("image.") for k in sd)
    has_visual = any(k.startswith("visual.") for k in sd)
    img_cfg = image_tower_config(cfg)

    params: Params = {}
    state: State = {"image": {"adapter": {}}, "visual": {"adapter": {}}}

    if has_image:
        params["image"], state["image"] = convert_vision_tower(sub(sd, "image."), img_cfg)
    elif has_visual:
        params["image"], state["image"] = convert_vision_tower(sub(sd, "visual."), img_cfg)

    if has_visual:
        vis_sd = sub(sd, "visual.")
        need_adapter = cfg.tower.modality not in ("image", "tactile", "video")
        has_adapter = any(k.startswith("visual_adapter.") for k in vis_sd)
        perc = cfg.tower.perceiver
        need_perc = perc is not None and not perc.as_identity
        has_perc = any(k.startswith("perceiver.") for k in vis_sd)
        if (need_adapter and not has_adapter) or (need_perc and not has_perc):
            # plain CLIP ckpt into a Lens tower: still load the shared trunk
            # subset so train-from-CLIP recipes start from pretrained weights
            # (reference factory.py:138-160 non-strict load); only the
            # adapter/perceiver stay at random init.
            params["visual"] = convert_shared_vision_subset(vis_sd, cfg.tower)
        else:
            params["visual"], state["visual"] = convert_vision_tower(vis_sd, cfg.tower)

    # text: TriCLIP keeps text modules inline at the top level
    if cfg.text.hf_style and any(k.startswith("text.transformer.")
                                 for k in sd):
        # open_clip CustomTextCLIP with HFTextEncoder (hf_model.py:107-180):
        # the HF module under text.transformer.*, the mlp proj as
        # text.proj.{0,2}.weight (Sequential(Linear, GELU, Linear), no bias)
        params["text"] = convert_hf_text_tower(sub(sd, "text."))
    elif "token_embedding.weight" in sd:
        params["text"] = convert_text_tower(sd, cfg.text.layers)
    elif any(k.startswith("text.") for k in sd):
        params["text"] = convert_text_tower(sub(sd, "text."), cfg.text.layers)

    if "logit_scale" in sd:
        params["logit_scale"] = _j(sd["logit_scale"]).reshape(())
    return params, state


def load_torch_checkpoint(path: str):
    """Load a .pt checkpoint on CPU and return its (possibly nested)
    state dict (reference: training/file_utils.py pt_load +
    factory.py:107-127 load_state_dict). Also handles OpenAI's TorchScript
    archives (reference openai.py: torch.jit.load -> state_dict)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        # OpenAI CLIP ships TorchScript archives
        ckpt = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(ckpt, "state_dict") and not isinstance(ckpt, dict):
        ckpt = ckpt.state_dict()
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        return ckpt["model"]
    return ckpt


# ---------------------------------------------------------------------------
# OpenShape pc baseline checkpoints (VitLens-OpenShape/src/models/{ppat,
# dgcnn,pointnet2}.py) -> models/pc_baselines.py params
# ---------------------------------------------------------------------------


def _conv1x1_2d(sd: Mapping[str, Any], name: str) -> Params:
    """Conv2d kernel 1x1 -> matmul params."""
    w = _np(sd[f"{name}.weight"])  # [out, in, 1, 1]
    p = {"w": jnp.asarray(w[..., 0, 0].T, jnp.float32)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _convert_sa(sd: Mapping[str, Any], n_layers: int) -> Tuple[Params, State]:
    """PointNetSetAbstraction mlp_convs/mlp_bns (pointnet_util.py:171-184)."""
    ps, ss = [], []
    for i in range(n_layers):
        bn_p, bn_s = _bn(sd, f"mlp_bns.{i}")
        ps.append({"conv": _conv1x1_2d(sd, f"mlp_convs.{i}"), "bn": bn_p})
        ss.append({"bn": bn_s})
    return {"mlp": ps}, {"mlp": ss}


def _convert_sa_msg(sd: Mapping[str, Any],
                    mlp_list) -> Tuple[Params, State]:
    """PointNetSetAbstractionMsg conv_blocks/bn_blocks
    (pointnet_util.py:216-231)."""
    branches, states = [], []
    for i, mlp in enumerate(mlp_list):
        ps, ss = [], []
        for j in range(len(mlp)):
            bn_p, bn_s = _bn(sd, f"bn_blocks.{i}.{j}")
            ps.append({"conv": _conv1x1_2d(sd, f"conv_blocks.{i}.{j}"),
                       "bn": bn_p})
            ss.append({"bn": bn_s})
        branches.append(ps)
        states.append(ss)
    return {"branches": branches}, {"branches": states}


def convert_ppat_state_dict(sd: Mapping[str, Any],
                            depth: int) -> Tuple[Params, State]:
    """Projected(PointPatchTransformer, Linear) weights (ppat.py:86-124)."""
    sd = strip_prefixes(sd)
    sa_p, sa_s = _convert_sa(sub(sd, "ppat.sa."), 3)
    layers = []
    for l in range(depth):
        pre = f"ppat.transformer.layers.{l}"
        layers.append({
            "attn": {
                "ln": _ln(sd, f"{pre}.0.norm"),
                "qkv": _linear(sd, f"{pre}.0.fn.to_qkv"),
                "out": _linear(sd, f"{pre}.0.fn.to_out.0"),
            },
            "ff": {
                "ln": _ln(sd, f"{pre}.1.norm"),
                "fc": _linear(sd, f"{pre}.1.fn.net.0"),
                "proj": _linear(sd, f"{pre}.1.fn.net.3"),
            },
        })
    params: Params = {
        "sa": sa_p,
        "lift": {"conv": _conv1x1(sd, "ppat.lift.0"),
                 "ln": _ln(sd, "ppat.lift.2")},
        "cls_token": _j(sd["ppat.cls_token"]),
        "blocks": _stack(layers),
        "proj": _linear(sd, "proj"),
    }
    return params, {"sa": sa_s}


def convert_dgcnn_state_dict(sd: Mapping[str, Any]) -> Tuple[Params, State]:
    """DGCNN weights (dgcnn.py:67-101). BN params live under bn{i}.bn
    (the NoCuDNN wrappers); the convs are Sequential index 0."""
    sd = strip_prefixes(sd)
    params: Params = {}
    state: State = {}
    for i in range(1, 6):
        bn_p, bn_s = _bn(sd, f"bn{i}.bn")
        conv = (_conv1x1_2d(sd, f"conv{i}.0") if i < 5
                else _conv1x1(sd, f"conv{i}.0"))
        params[f"conv{i}"] = {"conv": conv, "bn": bn_p}
        state[f"conv{i}"] = {"bn": bn_s}
    params["linear1"] = _linear(sd, "linear1")
    params["bn6"], state["bn6"] = _bn(sd, "bn6")
    params["linear2"] = _linear(sd, "linear2")
    return params, state


def convert_pointnet2_state_dict(
        sd: Mapping[str, Any]) -> Tuple[Params, State]:
    """pointnet2.get_model weights (pointnet2.py:6-20)."""
    sd = strip_prefixes(sd)
    params: Params = {}
    state: State = {}
    params["sa1"], state["sa1"] = _convert_sa_msg(
        sub(sd, "sa1."), [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
    params["sa2"], state["sa2"] = _convert_sa_msg(
        sub(sd, "sa2."), [[64, 64, 128], [128, 128, 256], [128, 128, 256]])
    params["sa3"], state["sa3"] = _convert_sa(sub(sd, "sa3."), 3)
    for i in (1, 2):
        params[f"fc{i}"] = _linear(sd, f"fc{i}")
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"bn{i}")
    params["fc3"] = _linear(sd, "fc3")
    return params, state
