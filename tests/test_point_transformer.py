"""PointTransformer parity vs the reference PointBERT classifier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import PointAdapterConfig
from vitlens_tpu.models.point_transformer import (
    PointTransformerConfig, convert_point_transformer, label_smoothing_loss,
    point_transformer_apply, point_transformer_init,
)
from tests import ref_oracle
from tests.helpers import rel_err


def test_point_transformer_parity():
    import torch

    pe = ref_oracle.load("open_clip.modal_3d.models.pointbert.point_encoder")
    from easydict import EasyDict as edict

    cfg = PointTransformerConfig(
        point=PointAdapterConfig(num_group=16, group_size=8, encoder_dims=24,
                                 trans_dim=32, npoints=128),
        depth=3, num_heads=2, do_cat=True, output_dim=20,
    )
    torch.manual_seed(0)
    ref = pe.PointTransformer(config=edict(
        trans_dim=32, depth=3, drop_path_rate=0.0, num_heads=2,
        group_size=8, num_group=16, encoder_dims=24, do_cat=True,
    ), output_dim=20)
    ref.eval()
    with torch.no_grad():
        # make the zero-init cls token non-trivial
        ref.cls_token.add_(0.02 * torch.randn_like(ref.cls_token))

    x = np.random.RandomState(0).randn(2, 128, 3).astype(np.float32)
    orig = torch.randint
    try:
        torch.randint = lambda lo, hi, size, **kw: torch.zeros(
            size, dtype=kw.get("dtype", torch.long))
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
    finally:
        torch.randint = orig

    params, state = convert_point_transformer(ref.state_dict(), cfg)
    got, _ = point_transformer_apply(params, state, jnp.asarray(x), cfg)
    assert rel_err(np.asarray(got), want) < 1e-4


def test_label_smoothing_loss_matches_reference():
    import torch

    pe = ref_oracle.load("open_clip.modal_3d.models.pointbert.point_encoder")
    from easydict import EasyDict as edict

    torch.manual_seed(1)
    ref = pe.PointTransformer(config=edict(
        trans_dim=16, depth=1, drop_path_rate=0.0, num_heads=2,
        group_size=4, num_group=8, encoder_dims=8, do_cat=False))
    rng = np.random.RandomState(1)
    pred = rng.randn(6, 10).astype(np.float32)
    gt = rng.randint(0, 10, 6)
    want_loss, want_acc = ref.get_loss_acc(torch.from_numpy(pred),
                                           torch.from_numpy(gt))
    loss, acc = label_smoothing_loss(jnp.asarray(pred), jnp.asarray(gt))
    assert abs(float(loss) - want_loss.item()) < 1e-5
    assert abs(float(acc) - want_acc.item()) < 1e-4
