"""OpenShape/vitlensG path: PNSA tokenizer parity vs reference, masks,
contras loss, triplet dataset, precomputed-text eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import PointAdapterConfig
from vitlens_tpu.adapters.tokenizers import pnsa_tokenizer_apply
from vitlens_tpu.train import openshape as OS
from tests import ref_oracle
from tests.helpers import rel_err


def test_pnsa_tokenizer_parity():
    """vs reference PointNSATokenizer with deterministic FPS start."""
    import torch

    pn = ref_oracle.load("open_clip.modal_3d.models.pointnet.pointnet_util")
    from easydict import EasyDict as edict

    cfg = PointAdapterConfig(tokenizer="pnsa", num_group=16, group_size=8,
                             encoder_dims=24, trans_dim=32, in_channel=6,
                             radius=0.4)
    torch.manual_seed(0)
    ref = pn.PointNSATokenizer(config=edict(
        num_group=cfg.num_group, radius=cfg.radius, group_size=cfg.group_size,
        in_dim=cfg.in_channel, encoder_dims=cfg.encoder_dims,
        trans_dim=cfg.trans_dim,
    ))
    ref.eval()

    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = np.concatenate([xyz, rng.rand(2, 64, 3).astype(np.float32)], -1)

    orig_randint = torch.randint
    try:
        torch.randint = lambda lo, hi, size, **kw: torch.zeros(
            size, dtype=kw.get("dtype", torch.long))
        with torch.no_grad():
            want = ref(torch.from_numpy(feats), xyz=torch.from_numpy(xyz))[
                "x"].numpy()
    finally:
        torch.randint = orig_randint

    # convert weights
    from vitlens_tpu.weights.torch_convert import _convert_adapter
    from vitlens_tpu.config import TowerConfig, VisionArch

    tower = TowerConfig(arch=VisionArch(), embed_dim=8, modality="pc", point=cfg)
    sd = {f"visual_adapter.{k}": v for k, v in ref.state_dict().items()}
    params, state = _convert_adapter(sd, tower)
    (got, _), _ = pnsa_tokenizer_apply(
        params, state, jnp.asarray(feats), jnp.asarray(xyz), cfg, train=False)
    assert rel_err(np.asarray(got), want) < 1e-4


def test_knn_negative_mask():
    m = OS.knn_negative_mask(batch_size=2, k=3)
    assert m.shape == (6, 6)
    assert np.all(np.diag(m) == 1)
    # within-group off-diagonal masked out
    assert m[0, 1] == 0 and m[0, 2] == 0
    # cross-group kept
    assert m[0, 3] == 1


def test_sim_margin_mask():
    img = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    txt = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    m = np.asarray(OS.sim_margin_mask(img, txt, threshold=0.5))
    # diagonal sim is 1, off-diag 0 -> margin 1 > 0.5 -> negatives kept
    assert np.all(m[~np.eye(4, dtype=bool)] == 1)
    assert np.all(np.diag(m) == 0)  # diag margin is 0, masked (matches ref math)


def test_contras_loss_and_full_openshape_loss():
    rng = np.random.RandomState(0)
    tower = OS.vitlensG_tower_config()
    # shrink for test
    from dataclasses import replace

    from vitlens_tpu.config import PerceiverConfig, VisionArch

    arch = VisionArch(image_size=28, patch_size=14, width=32, layers=4,
                      head_width=16)
    tower = replace(
        tower, arch=arch, embed_dim=16, skip_first_n_layers=2,
        point=replace(tower.point, num_group=8, group_size=4,
                      encoder_dims=16, trans_dim=16, npoints=32),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=32,
                                  input_dim=16, cross_heads=1,
                                  cross_dim_head=8, latent_heads=2,
                                  latent_dim_head=8),
    )
    params, state = OS.clip_bind_init(jax.random.PRNGKey(0), tower,
                                      out_channel=24)
    assert "proj_layer" in params  # 16 != 24 -> replacement proj
    batch = {
        "xyz_features": jnp.asarray(rng.randn(4, 32, 6), jnp.float32),
        "text_feat": jnp.asarray(rng.randn(4, 24), jnp.float32),
        "img_feat": jnp.asarray(rng.randn(4, 24), jnp.float32),
    }
    loss, (metrics, _) = OS.openshape_loss(params, state, batch, tower,
                                           train=False)
    assert np.isfinite(float(loss))
    assert 0 <= float(metrics["text_acc"]) <= 1

    # grads flow and trunk lr-scale masks the right subtree
    g = jax.grad(lambda p: OS.openshape_loss(p, state, batch, tower,
                                             train=False)[0])(params)
    scale = OS.trunk_lr_scale(params, 0.1)
    assert float(jax.tree.leaves(scale["backbone"]["trunk"])[0]) == pytest.approx(0.1)
    assert float(np.asarray(scale["logit_scale"])) == 1.0


def test_triplet_dataset_and_eval(tmp_path):
    rng = np.random.RandomState(0)
    files = []
    for i in range(3):
        blob = {"xyz": rng.randn(500, 3).astype(np.float32),
                "rgb": rng.rand(500, 3).astype(np.float32),
                "text_feat": rng.randn(24).astype(np.float32),
                "img_feat": rng.randn(24).astype(np.float32)}
        p = tmp_path / f"obj{i}.npy"
        np.save(p, blob, allow_pickle=True)
        files.append(str(p))
    ds = OS.OpenShapeTripletDataset(files, npoints=128)
    item = ds[0]
    assert item["xyz_features"].shape == (128, 6)
    assert np.max(np.linalg.norm(item["xyz_features"][:, :3], axis=1)) <= 1 + 1e-5
    assert item["text_feat"].shape == (24,)

    cls_feats = rng.randn(5, 24).astype(np.float32)
    preds = cls_feats[np.array([0, 1, 2, 2, 4])] + 0.01 * rng.randn(5, 24)
    out = OS.precomputed_text_eval(preds, np.array([0, 1, 2, 2, 4]), cls_feats)
    assert out["top1"] == 1.0
    assert out["class_top1"] == 1.0


def test_openshape_loss_with_pc_baseline():
    """pc_model != clipbind routes through the baseline encoders
    (reference config model.name; models/__init__.py dispatch)."""
    rng = np.random.RandomState(1)
    tower = None  # unused on the baseline path
    batch = {
        "xyz_features": jnp.asarray(rng.randn(4, 64, 6), jnp.float32),
        "text_feat": jnp.asarray(rng.randn(4, 24), jnp.float32),
        "img_feat": jnp.asarray(rng.randn(4, 24), jnp.float32),
    }
    for name in ("DGCNN", "PointBERT"):
        params, state = OS.baseline_bind_init(
            jax.random.PRNGKey(0), name, in_channel=6, out_channel=24,
            scaling=1)
        loss, (metrics, new_state) = OS.openshape_loss(
            params, state, batch, tower, train=True, pc_model=name,
            pc_scaling=1, fps_key=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), name
        g = jax.grad(lambda p: OS.openshape_loss(
            p, state, batch, tower, train=True, pc_model=name, pc_scaling=1,
            fps_key=jax.random.PRNGKey(1))[0])(params)
        gn = np.sqrt(sum(float(np.sum(np.square(np.asarray(x))))
                         for x in jax.tree.leaves(g["encoder"])))
        assert gn > 0, name
