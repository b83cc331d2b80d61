"""Train-time PatchDropout (reference transformer.py:53-90, applied at
:770-771; --force-patch-dropout factory.py:228-230). Closes the round-1
partial row: inference stays an exact no-op, training keeps CLS + a random
max(1, n*(1-p)) patch subset with static shapes under jit."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import EEGAdapterConfig, PerceiverConfig, TowerConfig
from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
from tests.helpers import small_arch


@pytest.fixture(scope="module")
def tower():
    arch = small_arch()
    cfg = TowerConfig(
        arch=arch, embed_dim=48, modality="eeg",
        eeg=EEGAdapterConfig(chans=16, time_len=32, window_size=1, stride=1),
        perceiver=PerceiverConfig(depth=1, num_latents=16, latent_dim=64,
                                  input_dim=64, cross_heads=1,
                                  cross_dim_head=16, latent_heads=2,
                                  latent_dim_head=32),
        patch_dropout=0.5,
    )
    params, state = vision_tower_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32), jnp.float32)
    return cfg, params, state, x


def test_eval_is_exact_noop(tower):
    cfg, params, state, x = tower
    cfg0 = dataclasses.replace(cfg, patch_dropout=0.0)
    out, _ = vision_tower_apply(params, state, x, cfg, train=False,
                                fps_key=jax.random.PRNGKey(1))
    out0, _ = vision_tower_apply(params, state, x, cfg0, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out0))


def test_train_drops_patches_statically(tower):
    cfg, params, state, x = tower
    (pooled, toks), _ = vision_tower_apply(
        params, state, x, cfg, train=True, fps_key=jax.random.PRNGKey(1),
        output_tokens=True)
    n = cfg.num_tokens
    keep = max(1, int(n * (1.0 - cfg.patch_dropout)))
    assert toks.shape == (2, keep, cfg.arch.width)
    assert np.all(np.isfinite(np.asarray(pooled)))
    # jit-compatible (static shapes)
    f = jax.jit(lambda p, s, x, k: vision_tower_apply(
        p, s, x, cfg, train=True, fps_key=k)[0])
    np.asarray(f(params, state, x, jax.random.PRNGKey(2)))


def test_train_is_stochastic_but_key_deterministic(tower):
    cfg, params, state, x = tower
    f = lambda k: np.asarray(vision_tower_apply(
        params, state, x, cfg, train=True, fps_key=k)[0])
    a, b = f(jax.random.PRNGKey(1)), f(jax.random.PRNGKey(2))
    assert not np.allclose(a, b)  # different keys -> different subsets
    np.testing.assert_array_equal(a, f(jax.random.PRNGKey(1)))
    # no key -> disabled even in train mode
    nk, _ = vision_tower_apply(params, state, x, cfg, train=True)
    cfg0 = dataclasses.replace(cfg, patch_dropout=0.0)
    full, _ = vision_tower_apply(params, state, x, cfg0, train=True)
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(full))


def test_cli_flag_trains(tmp_path, monkeypatch):
    import json

    from vitlens_tpu.cli.train import main

    monkeypatch.setattr(jax, "devices",
                        lambda *a, **k: jax.local_devices(backend="cpu")[:2])
    rc = main([
        "--modality", "eeg", "--model", "ViT-Tiny-Test",
        "--dataset-type", "synthetic", "--train-data", "synthetic",
        "--train-num-samples", "8", "--batch-size", "2", "--epochs", "1",
        "--warmup", "1", "--precision", "fp32", "--n-tower", "3",
        "--force-patch-dropout", "0.5", "--log-every-n-steps", "1",
        "--logs", str(tmp_path), "--name", "pd",
    ])
    assert rc == 0
    recs = [json.loads(l) for l in (tmp_path / "pd" / "results.jsonl"
                                    ).read_text().splitlines()]
    train = [r for r in recs if "train/loss" in r]
    assert train and np.isfinite(train[-1]["train/loss"])
    assert train[-1]["train/grad_norm"] > 0
