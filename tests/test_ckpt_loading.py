"""Torch checkpoint file loading through the public paths: factory
create_model(checkpoint_path=...) and ViTLens(checkpoints=...), using a real
saved reference TriCLIP state dict (incl. the DDP 'module.' prefix and the
nested {'state_dict': ...} wrapper the reference writes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_tri_model_parity import _build_ref_tri, _tiny_cfg
from tests.helpers import rel_err


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch

    cfg = _tiny_cfg()
    ref = _build_ref_tri(cfg, seed=5)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}  # DDP prefix
    path = tmp_path_factory.mktemp("ckpt") / "tiny_tri.pt"
    torch.save({"epoch": 3, "name": "test", "state_dict": sd}, str(path))
    return cfg, ref, str(path)


def test_factory_checkpoint_path(ckpt):
    import torch

    cfg, ref, path = ckpt
    from vitlens_tpu.factory import _merge
    from vitlens_tpu.models import tri
    from vitlens_tpu.weights.torch_convert import (
        convert_tri_state_dict, load_torch_checkpoint,
    )
    import jax

    sd = load_torch_checkpoint(path)
    loaded_p, loaded_s = convert_tri_state_dict(sd, cfg)
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    params = _merge(params, loaded_p)
    state = _merge(state, loaded_s)

    rng = np.random.RandomState(0)
    eeg = rng.randn(2, 16, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_visual(torch.from_numpy(eeg), normalize=True).numpy()
    feats, _ = tri.encode_visual(params, state, jnp.asarray(eeg), cfg,
                                 normalize=True)
    assert rel_err(np.asarray(feats), want) < 2e-5


def test_vitlens_api_checkpoint_loading(ckpt):
    import torch

    cfg, ref, path = ckpt
    # the API builds standard-size towers; here we exercise its _load_ckpt
    # plumbing directly against a matching tower config
    from vitlens_tpu.models.vit import vision_tower_apply
    from vitlens_tpu.weights.torch_convert import (
        convert_vision_tower, load_torch_checkpoint, strip_prefixes, sub,
    )

    sd = strip_prefixes(load_torch_checkpoint(path))
    tower_sd = sub(sd, "visual.")
    params, state = convert_vision_tower(tower_sd, cfg.tower)
    rng = np.random.RandomState(1)
    eeg = rng.randn(2, 16, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.visual(torch.from_numpy(eeg)).numpy()
    got, _ = vision_tower_apply(params, state, jnp.asarray(eeg), cfg.tower)
    assert rel_err(np.asarray(got), want) < 2e-5


def test_plain_clip_ckpt_into_lens_tower(ckpt):
    """A plain two-tower CLIP state dict (visual.* = image tower, no
    adapter/perceiver keys) loaded into a Lens-modality tri config must still
    convert the SHARED subset into params['visual'] — trunk blocks, ln_pre/
    ln_post, proj, class/positional embeddings — matching the reference's
    non-strict dual-key load (factory.py:138-160). Round-1 regression: the
    except-KeyError path silently dropped the whole tower, leaving the
    pretrained trunk at random init."""
    import jax
    import torch

    cfg, ref, _path = ckpt
    from vitlens_tpu.factory import _merge
    from vitlens_tpu.models import tri
    from vitlens_tpu.weights.torch_convert import convert_tri_state_dict

    # simulate a plain CLIP checkpoint: the ref tri model's *image* tower
    # (a standard CLIP ViT) exposed under 'visual.', plus inline text keys
    full = ref.state_dict()
    plain = {}
    for k, v in full.items():
        if k.startswith("image."):
            plain["visual." + k[len("image."):]] = v
        elif not k.startswith("visual."):
            plain[k] = v

    loaded_p, loaded_s = convert_tri_state_dict(plain, cfg)

    # shared trunk subset present, Lens-only params absent (stay random)
    vis = loaded_p["visual"]
    for key in ("trunk", "ln_pre", "ln_post", "proj", "class_embedding",
                "positional_embedding"):
        assert key in vis, key
    assert "perceiver" not in vis
    assert "adapter" not in vis  # eeg adapter is not shared with an image tower

    # the shared trunk must be numerically identical to the image tower's
    img_trunk = loaded_p["image"]["trunk"]["blocks"]
    vis_trunk = vis["trunk"]["blocks"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), img_trunk, vis_trunk)

    # merged over random init: image encode matches the torch reference, and
    # the visual tower still runs (random adapter/perceiver + loaded trunk)
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    params = _merge(params, loaded_p)
    state = _merge(state, loaded_s)
    rng = np.random.RandomState(2)
    images = rng.randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(images), normalize=True).numpy()
    got = tri.encode_image(params, state, jnp.asarray(images), cfg, normalize=True)
    assert rel_err(np.asarray(got), want) < 2e-5
    feats, _ = tri.encode_visual(
        params, state, jnp.asarray(rng.randn(2, 16, 32).astype(np.float32)),
        cfg, normalize=True)
    assert np.all(np.isfinite(np.asarray(feats)))
