"""EVA trunk parity vs reference blip_eva_vit at reduced scale."""

import numpy as np
import pytest

import jax.numpy as jnp

from vitlens_tpu.models.eva import (
    EVAArch, convert_eva_state_dict, eva_trunk_apply,
)
from tests import ref_oracle
from tests.helpers import rel_err


def _small_ref_eva(depth=3, width=64, heads=4, proj_dim=24, img=28, patch=14):
    import torch
    from functools import partial
    import torch.nn as nn

    ev = ref_oracle.load("open_clip.third_vit.blip_eva_vit")
    torch.manual_seed(0)
    m = ev.VisionTransformer(
        img_size=img, patch_size=patch, use_mean_pooling=False,
        embed_dim=width, num_classes=proj_dim, depth=depth,
        num_heads=heads, mlp_ratio=4.3637, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    m.eval()
    # randomize biases/pos so parity is non-trivial
    with torch.no_grad():
        for n, p in m.named_parameters():
            if p.std() == 0:
                p.add_(0.02 * torch.randn_like(p))
    return m


def test_eva_trunk_parity_image_path():
    import torch

    arch = EVAArch(image_size=28, patch_size=14, width=64, layers=3,
                   head_width=16, mlp_ratio=4.3637, proj_dim=24)
    ref = _small_ref_eva(depth=3, width=64, heads=4, proj_dim=24)
    x = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        feats = ref.forward_features_norm(torch.from_numpy(x))
        want = ref.head(feats).numpy()
    params = convert_eva_state_dict(ref.state_dict(), arch)
    got = eva_trunk_apply(params, jnp.asarray(x), arch)
    assert rel_err(np.asarray(got), want) < 2e-5


def test_eva_trunk_parity_tokens_path_with_skip():
    import torch

    arch = EVAArch(image_size=28, patch_size=14, width=64, layers=4,
                   head_width=16, mlp_ratio=4.3637, proj_dim=24)
    ref = _small_ref_eva(depth=4, width=64, heads=4, proj_dim=24)
    # emulate the wrapper: skip first 2 layers, feed tokens directly
    ref.blocks = ref.blocks[-2:]
    toks = np.random.RandomState(1).randn(2, 4, 64).astype(np.float32)
    with torch.no_grad():
        feats = ref.forward_features_norm(torch.from_numpy(toks),
                                          do_patch_embed=False)
        want = ref.head(feats).numpy()
    # convert from the ORIGINAL 4-layer dict; apply with skip_first_n=2
    ref2 = _small_ref_eva(depth=4, width=64, heads=4, proj_dim=24)
    # rebuild identical module for full state dict
    params = convert_eva_state_dict(_full_sd(ref, ref2), arch)
    got = eva_trunk_apply(params, jnp.asarray(toks), arch, tokens_input=True,
                          skip_first_n=2)
    assert rel_err(np.asarray(got), want) < 2e-5


def _full_sd(ref_trimmed, ref_fresh):
    """Rebuild a full 4-layer state dict whose LAST 2 blocks equal the
    trimmed reference's blocks (first 2 are skipped anyway)."""
    sd = {k: v.clone() for k, v in ref_fresh.state_dict().items()}
    trimmed = ref_trimmed.state_dict()
    for k, v in trimmed.items():
        if k.startswith("blocks."):
            i = int(k.split(".")[1])
            rest = k.split(".", 2)[2]
            sd[f"blocks.{i + 2}.{rest}"] = v.clone()
        else:
            sd[k] = v.clone()
    return sd


def test_perceiver_eva_composition_runs():
    import jax

    from vitlens_tpu.config import (PerceiverConfig, PointAdapterConfig,
                                    TowerConfig, VisionArch)
    from vitlens_tpu.models.eva import perceiver_eva_apply, perceiver_eva_init

    arch = EVAArch(image_size=28, patch_size=14, width=32, layers=2,
                   head_width=16, proj_dim=24)
    tower = TowerConfig(
        arch=VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                        head_width=16),
        embed_dim=16, modality="pc",
        point=PointAdapterConfig(num_group=8, group_size=4, encoder_dims=16,
                                 trans_dim=16, npoints=32),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=32,
                                  input_dim=16, cross_heads=1,
                                  cross_dim_head=8, latent_heads=2,
                                  latent_dim_head=8),
    )
    params, state = perceiver_eva_init(jax.random.PRNGKey(0), tower, arch,
                                       embed_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 3), jnp.float32)
    out, _ = perceiver_eva_apply(params, state, x, tower, arch)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))
