"""Mesh-sharded `evaluate`: with a data mesh every chip sees a slice of each
visual-encode batch (reference shards eval across ranks, zero_shot.py:709-788)
and the metrics are identical to the single-device path — padding rows added
for divisibility are trimmed before any metric sees them."""

import numpy as np
import pytest

import jax

from tests.conftest import cpu_devices
from vitlens_tpu.cli import train as T
from vitlens_tpu.cli.args import TrainArgs
from vitlens_tpu.config import make_model_config
from vitlens_tpu.models import tri
from vitlens_tpu.parallel.mesh import make_mesh
from vitlens_tpu.text.tokenizer import get_tokenizer


def _fake_ds_factory(cfg, n=7, seed=0):
    e = cfg.tower.eeg
    rng = np.random.RandomState(seed)
    data = rng.randn(n, e.chans, e.time_len).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int64)

    class FakeDS:
        eval_metric = "acc"
        classnames = ["alpha", "beta"]
        templates = ["a photo of {}."]

        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"id": i, "eeg": data[i], "label": int(labels[i])}

    return FakeDS


def test_evaluate_sharded_matches_single(monkeypatch):
    cfg = make_model_config("ViT-Tiny-Test", "eeg")
    FakeDS = _fake_ds_factory(cfg, n=7)  # odd: forces pad-to-8 + trim
    monkeypatch.setattr(
        T, "_build_real_dataset",
        lambda args, spec, train, cfg=None: FakeDS())
    args = TrainArgs(modality="eeg", model="ViT-Tiny-Test", val_data="fake",
                     precision="fp32", batch_size=3, workers=1)
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()

    single = T.evaluate(args, params, state, cfg, tok)
    mesh = make_mesh(devices=cpu_devices())
    assert mesh.shape["data"] == 8
    sharded = T.evaluate(args, params, state, cfg, tok, mesh=mesh)

    assert single["fake"]["accuracy"] == pytest.approx(
        sharded["fake"]["accuracy"])
    assert single["fake"]["top1"] == pytest.approx(sharded["fake"]["top1"])
