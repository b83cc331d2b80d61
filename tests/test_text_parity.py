"""Text tower parity vs reference TextTransformer (transformer.py:795-930)."""

import numpy as np

import jax.numpy as jnp

from vitlens_tpu.config import TextArch
from vitlens_tpu.models.text import text_tower_apply
from vitlens_tpu.weights.torch_convert import convert_text_tower
from tests import ref_oracle
from tests.helpers import rel_err

TOL = 2e-5


def _build_ref_text(cfg: TextArch, embed_dim: int, quick_gelu=False, seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    tfm = ref_oracle.load("open_clip.transformer")
    t = tfm.TextTransformer(
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        width=cfg.width,
        heads=cfg.heads,
        layers=cfg.layers,
        output_dim=embed_dim,
        act_layer=tfm.QuickGELU if quick_gelu else nn.GELU,
        norm_layer=tfm.LayerNorm,
    )
    t.eval()
    return t


def test_text_tower_parity():
    import torch

    cfg = TextArch(context_length=12, vocab_size=100, width=32, heads=2, layers=3)
    ref = _build_ref_text(cfg, embed_dim=48)
    rng = np.random.RandomState(0)
    # token ids with EOT (=highest id) somewhere in each row
    ids = rng.randint(1, 90, size=(4, 12))
    eot_pos = rng.randint(3, 12, size=(4,))
    for i, p in enumerate(eot_pos):
        ids[i, p] = 99
        ids[i, p + 1:] = 0
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    params = convert_text_tower(ref.state_dict(), cfg.layers)
    got = text_tower_apply(params, jnp.asarray(ids), cfg)
    assert rel_err(np.asarray(got), want) < TOL


def test_text_tower_quickgelu_parity():
    import torch

    cfg = TextArch(context_length=12, vocab_size=100, width=32, heads=2, layers=2)
    ref = _build_ref_text(cfg, embed_dim=48, quick_gelu=True, seed=1)
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 90, size=(2, 12))
    ids[:, -1] = 99
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    params = convert_text_tower(ref.state_dict(), cfg.layers)
    got = text_tower_apply(params, jnp.asarray(ids), cfg, quick_gelu=True)
    assert rel_err(np.asarray(got), want) < TOL
