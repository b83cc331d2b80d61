"""Video path parity vs the reference ltpos pipeline + distill forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import (
    PerceiverConfig, TowerConfig, VideoAdapterConfig, VisionArch,
)
from vitlens_tpu.models.vit import vision_tower_apply
from tests.helpers import (
    build_ref_vision_tower, convert_ref_vision_tower, rel_err, small_arch,
)

TOL = 2e-5


def _video_tower():
    return TowerConfig(
        arch=small_arch(), embed_dim=48, modality="video",
        video=VideoAdapterConfig(n_frames=3, use_ltpos=True),
        perceiver=PerceiverConfig(
            depth=1, num_latents=16, latent_dim=64, input_dim=64,
            cross_heads=1, cross_dim_head=16, latent_heads=2,
            latent_dim_head=32, self_per_cross_attn=1,
        ),
    )


def test_video_tower_parity_ltpos():
    import torch

    tower = _video_tower()
    vt = build_ref_vision_tower(tower)
    x = np.random.RandomState(0).randn(2, 3, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = vt(torch.from_numpy(x)).numpy()
    params, state = convert_ref_vision_tower(vt, tower)
    got, _ = vision_tower_apply(params, state, jnp.asarray(x), tower)
    assert rel_err(np.asarray(got), want) < TOL


def test_video_distill_forward_shapes():
    from vitlens_tpu.config import ModelConfig, TextArch
    from vitlens_tpu.models import tri
    from vitlens_tpu.train.losses import distill_token_loss, tri_clip_loss

    tower = _video_tower()
    cfg = ModelConfig(
        name="tiny-video", embed_dim=48, vision=tower.arch,
        text=TextArch(context_length=8, vocab_size=50, width=32, heads=2,
                      layers=2),
        tower=tower,
    )
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randn(2, 3, 3, 56, 56), jnp.float32)
    text = np.zeros((2, 8), np.int32)
    text[:, 0], text[:, 1] = 1, 49
    out, _ = tri.tri_forward_video_distill(
        params, state, cfg, video_frames=frames, text=jnp.asarray(text),
        visual_x=frames,
    )
    assert out["image_features"].shape == (2, 48)
    assert out["visual_features"].shape == (2, 48)
    assert out["image_tokens"].shape[0] == 2
    assert out["visual_tokens"].shape[0] == 2
    loss = tri_clip_loss(out["image_features"], out["text_features"],
                         out["visual_features"], out["logit_scale"])
    # token shapes differ (image grid vs latents) -> distill on matching dims
    assert np.isfinite(float(loss))
