"""ModifiedResNet CLIP image tower.

Mirrors /root/reference/vitlens/src/open_clip/modified_resnet.py (kept in the
reference for open_clip compatibility; not used by any ViT-Lens result):
3-conv stem with avgpool, 4 bottleneck stages whose downsample is
avgpool->1x1 conv ("anti-aliasing"), and AttentionPool2d head (mean-token
query + learned pos emb, separate q/k/v projections).

Convs use lax.conv_general_dilated (NCHW/OIHW, the torch layout) so the
converter is a direct weight copy; BN runs in inference mode from running
stats by default (CLIP RN towers are used frozen here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from vitlens_tpu.models.layers import Params
from vitlens_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class ResNetArch:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    image_size: int = 224
    embed_dim: int = 1024
    heads: int = 32  # attn-pool heads = width * 32 // 64


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn_inference(x, p):
    """[B,C,H,W] BatchNorm from running stats (frozen towers)."""
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + 1e-5)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"]
            * jax.lax.rsqrt(p["var"] + 1e-5)).astype(x.dtype)
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _avgpool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def bottleneck_apply(x, p, stride: int):
    """Reference Bottleneck (modified_resnet.py:14-68): conv1(1x1)-bn-relu,
    conv2(3x3)-bn-relu, [avgpool if stride>1], conv3(1x1)-bn, residual
    (+avgpool->1x1conv downsample), relu."""
    out = jax.nn.relu(_bn_inference(_conv(x, p["conv1"]["w"]), p["bn1"]))
    out = jax.nn.relu(_bn_inference(_conv(out, p["conv2"]["w"], padding=1),
                                    p["bn2"]))
    if stride > 1:
        out = _avgpool2(out)
    out = _bn_inference(_conv(out, p["conv3"]["w"]), p["bn3"])
    identity = x
    if "downsample" in p:
        identity = x if stride == 1 else _avgpool2(x)
        identity = _bn_inference(_conv(identity, p["downsample"]["conv"]["w"]),
                                 p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def attention_pool2d_apply(x, p, heads: int):
    """Reference AttentionPool2d (modified_resnet.py:71-115): flatten HW,
    prepend mean token, +pos, MHA with separate q/k/v projections, take the
    mean-token output."""
    B, C, H, W = x.shape
    t = x.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, HW, C]
    t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
    t = t + p["positional_embedding"].astype(t.dtype)[None]
    q = t @ p["q_proj"]["w"].astype(t.dtype) + p["q_proj"]["b"].astype(t.dtype)
    k = t @ p["k_proj"]["w"].astype(t.dtype) + p["k_proj"]["b"].astype(t.dtype)
    v = t @ p["v_proj"]["w"].astype(t.dtype) + p["v_proj"]["b"].astype(t.dtype)
    N = t.shape[1]
    dh = C // heads

    def sh(z):
        return z.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

    o = dot_product_attention(sh(q), sh(k), sh(v))
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    o = o @ p["c_proj"]["w"].astype(t.dtype) + p["c_proj"]["b"].astype(t.dtype)
    return o[:, 0]


def modified_resnet_apply(p: Params, x: jnp.ndarray, arch: ResNetArch,
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B,3,H,W] -> [B, embed_dim]."""
    x = x.astype(compute_dtype)
    # stem: 3x (conv3x3-bn-relu), stride 2 on first, then avgpool
    x = jax.nn.relu(_bn_inference(_conv(x, p["conv1"]["w"], 2, 1), p["bn1"]))
    x = jax.nn.relu(_bn_inference(_conv(x, p["conv2"]["w"], 1, 1), p["bn2"]))
    x = jax.nn.relu(_bn_inference(_conv(x, p["conv3"]["w"], 1, 1), p["bn3"]))
    x = _avgpool2(x)
    for li, blocks in enumerate(p["layers"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = bottleneck_apply(x, bp, stride if bi == 0 else 1)
    return attention_pool2d_apply(x, p["attnpool"], arch.heads)


def convert_modified_resnet(sd, arch: ResNetArch) -> Params:
    """torch state dict -> pytree (direct conv copies, NCHW/OIHW kept)."""
    from vitlens_tpu.weights.torch_convert import _j

    def bn(name):
        return {"scale": _j(sd[f"{name}.weight"]), "bias": _j(sd[f"{name}.bias"]),
                "mean": _j(sd[f"{name}.running_mean"]),
                "var": _j(sd[f"{name}.running_var"])}

    def conv(name):
        return {"w": _j(sd[f"{name}.weight"])}

    def lin(name):
        return {"w": _j(sd[f"{name}.weight"]).T, "b": _j(sd[f"{name}.bias"])}

    p: Params = {
        "conv1": conv("conv1"), "bn1": bn("bn1"),
        "conv2": conv("conv2"), "bn2": bn("bn2"),
        "conv3": conv("conv3"), "bn3": bn("bn3"),
        "layers": [],
    }
    for li, n_blocks in enumerate(arch.layers):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}."
            bp = {
                "conv1": conv(pre + "conv1"), "bn1": bn(pre + "bn1"),
                "conv2": conv(pre + "conv2"), "bn2": bn(pre + "bn2"),
                "conv3": conv(pre + "conv3"), "bn3": bn(pre + "bn3"),
            }
            # reference downsample: OrderedDict("-1" avgpool, "0" conv,
            # "1" bn) -> params live at downsample.0 / downsample.1
            if f"{pre}downsample.0.weight" in sd:
                bp["downsample"] = {"conv": conv(pre + "downsample.0"),
                                    "bn": bn(pre + "downsample.1")}
            blocks.append(bp)
        p["layers"].append(blocks)
    p["attnpool"] = {
        "positional_embedding": _j(sd["attnpool.positional_embedding"]),
        "q_proj": lin("attnpool.q_proj"),
        "k_proj": lin("attnpool.k_proj"),
        "v_proj": lin("attnpool.v_proj"),
        "c_proj": lin("attnpool.c_proj"),
    }
    return p


# ---------------------------------------------------------------------------
# RN arch registry (reference model_configs/RN*.json, exact transcriptions;
# embed_dim/text pairs from the same files). The text tower for an RN CLIP
# is the standard TextTransformer at these widths.
# ---------------------------------------------------------------------------

RESNET_ARCH_REGISTRY = {
    "RN50": dict(arch=ResNetArch(layers=(3, 4, 6, 3), width=64,
                                 image_size=224, embed_dim=1024, heads=32),
                 embed_dim=1024, text_width=512, text_heads=8, text_layers=12),
    "RN101": dict(arch=ResNetArch(layers=(3, 4, 23, 3), width=64,
                                  image_size=224, embed_dim=512, heads=32),
                  embed_dim=512, text_width=512, text_heads=8, text_layers=12),
    "RN50x4": dict(arch=ResNetArch(layers=(4, 6, 10, 6), width=80,
                                   image_size=288, embed_dim=640, heads=40),
                   embed_dim=640, text_width=640, text_heads=10,
                   text_layers=12),
    "RN50x16": dict(arch=ResNetArch(layers=(6, 8, 18, 8), width=96,
                                    image_size=384, embed_dim=768, heads=48),
                    embed_dim=768, text_width=768, text_heads=12,
                    text_layers=12),
    "RN50x64": dict(arch=ResNetArch(layers=(3, 15, 36, 10), width=128,
                                    image_size=448, embed_dim=1024, heads=64),
                    embed_dim=1024, text_width=1024, text_heads=16,
                    text_layers=12),
}
