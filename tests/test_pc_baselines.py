"""OpenShape pc baseline parity vs the reference torch models
(VitLens-OpenShape/src/models/{ppat,dgcnn,pointnet2}.py), identical
converted weights, deterministic FPS start."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import ref_oracle
from tests.helpers import rel_err
from vitlens_tpu.models import pc_baselines as PB
from vitlens_tpu.weights.torch_convert import (
    convert_dgcnn_state_dict,
    convert_pointnet2_state_dict,
    convert_ppat_state_dict,
)


def _pin_fps_start(torch):
    """Reference farthest_point_sample falls back to a torch loop with a
    torch.randint start (pointnet_util.py:72-88; the dgl stub raises).
    Pin it to 0 to match our fps_indices default."""
    orig = torch.randint

    def fake(lo, hi, size, **kw):
        return torch.zeros(size, dtype=kw.get("dtype", torch.long))

    torch.randint = fake
    return orig


def test_ppat_parity():
    import torch

    ppat_ref = ref_oracle.load_openshape_model("ppat")
    cfg = ref_oracle.easydict(
        model=dict(scaling=1, in_channel=6, out_channel=32))
    torch.manual_seed(0)
    ref = ppat_ref.make(cfg)
    ref.eval()

    rng = np.random.RandomState(1)
    xyz = rng.randn(2, 300, 3).astype(np.float32)
    feats = np.concatenate(
        [xyz, rng.rand(2, 300, 3).astype(np.float32)], -1)

    orig = _pin_fps_start(torch)
    try:
        with torch.no_grad():
            want = ref(torch.from_numpy(xyz), torch.from_numpy(feats)).numpy()
    finally:
        torch.randint = orig

    params, state = convert_ppat_state_dict(ref.state_dict(), depth=6)
    got, _ = PB.ppat_apply(params, state, jnp.asarray(xyz),
                           jnp.asarray(feats), scaling=1)
    assert rel_err(np.asarray(got), want) < 1e-4


def test_dgcnn_parity():
    import torch

    dgcnn_ref = ref_oracle.load_openshape_model("dgcnn")
    cfg = ref_oracle.easydict(
        model=dict(scaling=1, in_channel=3, out_channel=24))
    torch.manual_seed(0)
    ref = dgcnn_ref.make(cfg)
    ref.eval()

    rng = np.random.RandomState(2)
    xyz = rng.randn(2, 64, 3).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(xyz), torch.from_numpy(xyz)).numpy()

    params, state = convert_dgcnn_state_dict(ref.state_dict())
    got, _ = PB.dgcnn_apply(params, state, jnp.asarray(xyz),
                            jnp.asarray(xyz), knn_exact=True)
    assert rel_err(np.asarray(got), want) < 1e-4


def test_pointnet2_parity():
    import torch

    pn2 = ref_oracle.load_openshape_model("pointnet2")
    torch.manual_seed(0)
    ref = pn2.get_model(num_class=16, normal_channel=True)
    ref.eval()

    rng = np.random.RandomState(3)
    pts = rng.randn(2, 600, 6).astype(np.float32)

    orig = _pin_fps_start(torch)
    try:
        with torch.no_grad():
            want_logits, want_feat = ref(
                torch.from_numpy(pts.transpose(0, 2, 1)))
    finally:
        torch.randint = orig

    params, state = convert_pointnet2_state_dict(ref.state_dict())
    (logits, feat), _ = PB.pointnet2_apply(
        params, state, jnp.asarray(pts), normal_channel=True)
    assert rel_err(np.asarray(logits), want_logits.numpy()) < 1e-4
    # reference returns l3_points channel-first [B, 1024, 1]
    assert rel_err(np.asarray(feat),
                   want_feat.numpy().reshape(feat.shape)) < 1e-4


def test_pointnet_and_factory():
    """PointNet has no importable oracle (torch_redstone is absent from the
    image, so the reference model cannot run either) — check the
    spec-equivalent rebuild end-to-end + the factory dispatch surface."""
    init, apply = PB.make_pc_baseline("PointNet", in_channel=6,
                                      out_channel=32, scaling=2)
    params, state = init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    xyz = jnp.asarray(rng.randn(2, 50, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 50, 6), jnp.float32)
    out, new_state = apply(params, state, xyz, feats, train=True)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()
    # train mode must update BN state
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state, new_state)
    assert any(jax.tree.leaves(changed))

    init, apply = PB.make_pc_baseline("PointBERT", in_channel=6,
                                      out_channel=16, scaling=1)
    params, state = init(jax.random.PRNGKey(1))
    out, _ = apply(params, state, xyz, feats)
    assert out.shape == (2, 16)

    # PointNet2 is classification-only (the reference trainer's make()
    # has no branch for it either); the bind surface must refuse it
    for absent in ("MinkowskiFCNN", "PointNeXt", "PointMLP", "PointNet2"):
        with pytest.raises(NotImplementedError):
            PB.make_pc_baseline(absent)


def test_ppat_patch_dropout_shrinks_patches():
    """ppat.py:101-103: training subtracts patch_dropout from the FPS patch
    count."""
    init, _ = PB.make_pc_baseline("PointBERT", in_channel=6, out_channel=8,
                                  scaling=1)
    params, state = init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    xyz = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(1, 128, 6), jnp.float32)
    out, _ = PB.ppat_apply(params, state, xyz, feats, scaling=1,
                           train=True, patch_dropout=8,
                           fps_key=jax.random.PRNGKey(2))
    assert out.shape == (1, 8)
