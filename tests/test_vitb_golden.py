"""Full-width golden parity: ViT-B-16 audio Lens tower + text tower vs the
reference at REAL scale (768-wide, 12 layers). Slower than the small-scale
parity tests but catches scale-dependent numerics (accumulation order,
padding, head counts). Marked slow-ish (~60s CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vitlens_tpu.config import make_model_config
from vitlens_tpu.models.text import text_tower_apply
from vitlens_tpu.models.vit import vision_tower_apply
from vitlens_tpu.weights.torch_convert import convert_text_tower
from tests.helpers import build_ref_vision_tower, convert_ref_vision_tower, rel_err


@pytest.mark.slow
def test_vitb_audio_tower_golden():
    import torch

    cfg = make_model_config("ViT-B-16", "audio")
    tower = cfg.tower
    vt = build_ref_vision_tower(tower, seed=7)
    x = np.random.RandomState(7).randn(2, 512, 128).astype(np.float32)
    with torch.no_grad():
        want = vt(torch.from_numpy(x)).numpy()
    params, state = convert_ref_vision_tower(vt, tower)
    got, _ = vision_tower_apply(params, state, jnp.asarray(x), tower)
    err = rel_err(np.asarray(got), want)
    assert err < 5e-5, err
    # also bf16 policy stays close at real scale
    got16, _ = vision_tower_apply(params, state, jnp.asarray(x), tower,
                                  compute_dtype=jnp.bfloat16)
    a = np.asarray(got16, np.float32)
    cos = np.sum(a * want, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(want, axis=-1))
    assert np.all(cos > 0.995), cos


@pytest.mark.slow
def test_vitb_text_tower_golden():
    import torch
    import torch.nn as nn

    from tests import ref_oracle

    cfg = make_model_config("ViT-B-16", "image")
    tfm = ref_oracle.load("open_clip.transformer")
    torch.manual_seed(3)
    ref = tfm.TextTransformer(
        context_length=77, vocab_size=49408, width=cfg.text.width,
        heads=cfg.text.heads, layers=cfg.text.layers, output_dim=cfg.embed_dim,
        act_layer=nn.GELU, norm_layer=tfm.LayerNorm,
    )
    ref.eval()
    from vitlens_tpu.text.tokenizer import get_tokenizer

    toks = get_tokenizer()(["a photo of a dog", "crackling fire",
                            "a point cloud model of a piano."])
    with torch.no_grad():
        want = ref(torch.from_numpy(toks.astype(np.int64))).numpy()
    params = convert_text_tower(ref.state_dict(), cfg.text.layers)
    got = text_tower_apply(params, jnp.asarray(toks), cfg.text)
    assert rel_err(np.asarray(got), want) < 5e-5
