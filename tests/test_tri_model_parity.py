"""Full TriCLIP end-to-end parity: build the reference 3-tower model, convert
its complete state dict, compare encode_image/encode_text/encode_visual and
the full forward outputs. Also: freeze-mask equivalence vs reference lock()."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import (
    EEGAdapterConfig, ModelConfig, PerceiverConfig, TextArch, TowerConfig,
)
from vitlens_tpu.models import tri
from vitlens_tpu.weights.torch_convert import convert_tri_state_dict
from tests import ref_oracle
from tests.helpers import make_ref_args, rel_err, small_arch

TOL = 2e-5


def _tiny_cfg() -> ModelConfig:
    arch = small_arch()
    tower = TowerConfig(
        arch=arch, embed_dim=48, modality="eeg",
        eeg=EEGAdapterConfig(chans=16, time_len=32, window_size=1, stride=1),
        perceiver=PerceiverConfig(depth=1, num_latents=16, latent_dim=64,
                                  input_dim=64, cross_heads=1,
                                  cross_dim_head=16, latent_heads=2,
                                  latent_dim_head=32),
    )
    return ModelConfig(
        name="tiny", embed_dim=48, vision=arch,
        text=TextArch(context_length=12, vocab_size=100, width=32, heads=2,
                      layers=2),
        tower=tower,
    )


def _build_ref_tri(cfg: ModelConfig, seed=0):
    import torch

    torch.manual_seed(seed)
    ref_oracle.install()
    model_mod = ref_oracle.load("open_clip.model")
    args = make_ref_args(cfg.tower)
    mc = ref_oracle.load("open_clip.module_cfg")

    vision_cfg = dict(
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        width=cfg.vision.width, layers=cfg.vision.layers,
        head_width=cfg.vision.head_width,
        visual_modality_type=args.visual_modality_type,
        use_perceiver=True, use_visual_adapter=True,
        perceiver_cfg=mc.get_perceiver_cfg(args),
        visual_adapter_cfg=mc.get_input_adapter_cfg(args),
        exp_args=args,
    )
    text_cfg = dict(context_length=cfg.text.context_length,
                    vocab_size=cfg.text.vocab_size, width=cfg.text.width,
                    heads=cfg.text.heads, layers=cfg.text.layers)
    m = model_mod.TriCLIP(embed_dim=cfg.embed_dim, vision_cfg=vision_cfg,
                          text_cfg=text_cfg, output_dict=True)
    m.eval()
    return m


@pytest.fixture(scope="module")
def both():
    cfg = _tiny_cfg()
    ref = _build_ref_tri(cfg)
    params, state = convert_tri_state_dict(ref.state_dict(), cfg)
    params.setdefault("logit_scale",
                      jnp.asarray(float(ref.logit_scale.detach())))
    return cfg, ref, params, state


def test_tri_forward_parity(both):
    import torch

    cfg, ref, params, state = both
    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 56, 56).astype(np.float32)
    eeg = rng.randn(2, 16, 32).astype(np.float32)
    text = rng.randint(1, 90, (2, 12))
    text[:, -1] = 99

    with torch.no_grad():
        want = ref(image=torch.from_numpy(images),
                   text=torch.from_numpy(text),
                   visual_x=torch.from_numpy(eeg))

    out, _ = tri.tri_forward(params, state, cfg,
                             images=jnp.asarray(images),
                             text=jnp.asarray(text),
                             visual_x=jnp.asarray(eeg))
    for k in ["image_features", "text_features", "visual_features"]:
        assert rel_err(np.asarray(out[k]), want[k].numpy()) < TOL, k
    np.testing.assert_allclose(float(out["logit_scale"]),
                               want["logit_scale"].item(), rtol=1e-6)


def test_encode_fns_match_forward(both):
    cfg, ref, params, state = both
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(2, 3, 56, 56), jnp.float32)
    fi = tri.encode_image(params, state, images, cfg, normalize=True)
    out, _ = tri.tri_forward(params, state, cfg, images=images)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(out["image_features"]),
                               rtol=1e-6)


def test_freeze_mask_matches_reference_lock(both):
    """Our trainability mask == reference requires_grad after lock() for a
    partial-unfreeze combination."""
    cfg, ref, params, state = both
    import torch

    from vitlens_tpu.train.freeze import vision_tower_mask

    ref.visual.lock(unlocked_groups=2, unlock_cls=True,
                    unlock_trans_first_n_layers=1)
    want = {n: p.requires_grad for n, p in ref.visual.named_parameters()}

    mask = vision_tower_mask(params["visual"], cfg.tower.arch.layers,
                             locked=True, unlocked_groups=2, unlock_cls=True,
                             unlock_trans_first_n_layers=1)

    n_layers = cfg.tower.arch.layers

    def mask_value(path_mask, idx=None):
        arr = np.asarray(path_mask)
        if idx is not None:
            arr = np.broadcast_to(arr, (n_layers,) + arr.shape[1:])[idx]
        return bool(np.all(arr > 0))

    # trunk layers
    for i in range(n_layers):
        trainable = want[f"transformer.resblocks.{i}.attn.in_proj_weight"]
        ours = mask_value(mask["trunk"]["blocks"]["attn"]["qkv_w"], i)
        assert ours == trainable, (i, ours, trainable)
    # cls / pos / ln_pre / ln_post / proj
    assert mask_value(mask["class_embedding"]) == want["class_embedding"]
    assert mask_value(mask["positional_embedding"]) == want["positional_embedding"]
    assert mask_value(mask["ln_pre"]["scale"]) == want["ln_pre.weight"]
    assert mask_value(mask["ln_post"]["scale"]) == want["ln_post.weight"]
    assert mask_value(mask["proj"]) == want["proj"]
    # perceiver + adapter always unlocked
    assert mask_value(mask["perceiver"]["latents"]) == want["perceiver.latents"]
    assert mask_value(mask["adapter"]["proj"]["w"]) == want[
        "visual_adapter.proj.weight"]


def test_freeze_mask_fully_locked_matches(both):
    cfg, ref2, params, state = both
    m2 = _build_ref_tri(cfg, seed=1)
    m2.visual.lock(unlocked_groups=0)
    want = {n: p.requires_grad for n, p in m2.visual.named_parameters()}
    from vitlens_tpu.train.freeze import vision_tower_mask

    mask = vision_tower_mask(params["visual"], cfg.tower.arch.layers,
                             locked=True)
    assert not np.any(np.asarray(mask["trunk"]["blocks"]["attn"]["qkv_w"]))
    assert want["transformer.resblocks.0.attn.in_proj_weight"] is False
    # Lens parts stay trainable in both
    assert want["perceiver.latents"] is True
    assert np.all(np.asarray(mask["perceiver"]["latents"]) > 0)
