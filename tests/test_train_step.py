"""Training-step tests: loss decreases, DP shard_map step == single-device
step on the same global batch, freeze masks hold, accum-freq replay matches
the plain step in expectation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vitlens_tpu.config import (
    EEGAdapterConfig,
    PerceiverConfig,
    TextArch,
    TowerConfig,
    ModelConfig,
    VisionArch,
)
from vitlens_tpu.models import tri
from vitlens_tpu.train.freeze import tri_model_mask, ones_like_mask, count_trainable
from vitlens_tpu.train.step import (
    OptimizerConfig,
    StepConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def tiny_model_cfg() -> ModelConfig:
    arch = VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                      head_width=16)
    eeg = EEGAdapterConfig(chans=8, time_len=16, window_size=1, stride=1)
    tower = TowerConfig(
        arch=arch, embed_dim=16, modality="eeg", eeg=eeg,
        perceiver=PerceiverConfig(
            depth=1, num_latents=4, latent_dim=32, input_dim=32,
            cross_heads=1, cross_dim_head=8, latent_heads=2, latent_dim_head=8,
            self_per_cross_attn=1,
        ),
    )
    return ModelConfig(
        name="tiny", embed_dim=16, vision=arch,
        text=TextArch(context_length=8, vocab_size=50, width=32, heads=2, layers=2),
        tower=tower,
    )


def tiny_batch(rng, n):
    text = rng.randint(1, 40, size=(n, 8)).astype(np.int32)
    text[:, -1] = 49  # highest id = EOT pool position
    return {
        "image": rng.randn(n, 3, 28, 28).astype(np.float32),
        "text": text,
        "visual": rng.randn(n, 8, 16).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_loss_decreases(setup):
    cfg, params, state = setup
    mask = ones_like_mask(params)
    tx, mask = make_optimizer(params, OptimizerConfig(lr=1e-3, warmup=1,
                                                      total_steps=100), mask)
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(0), 8)
    losses = []
    for _ in range(5):
        ts, metrics = step(ts, batch, None)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(ts.step) == 5


def test_sharded_step_matches_single_device(setup):
    cfg, params, state = setup
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100)
    )
    sc = StepConfig(n_tower=3, local_loss=True, compute_dtype=jnp.float32,
                    sync_bn=False)
    batch = tiny_batch(np.random.RandomState(1), 16)

    single = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts1 = init_train_state(params, state, tx)
    # single-device reference: global (non-local) loss
    sc_g = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                      sync_bn=False)
    single = make_train_step(cfg, tx, mask, sc_g, mesh=None)
    ts1, m1 = single(ts1, batch, None)

    devs = jax.local_devices(backend="cpu")[:4]
    mesh = Mesh(np.array(devs), ("data",))
    sharded = make_train_step(cfg, tx, mask, sc, mesh=mesh)
    ts2 = init_train_state(params, state, tx)
    ts2, m2 = sharded(ts2, batch, None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # Adam normalizes by sqrt(v)+eps, amplifying fp32 reduction-order noise
    # when grads are tiny; compare params at the scale of one update (lr=1e-3).
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_freeze_mask_holds(setup):
    cfg, params, state = setup
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True,
                          lock_visual=True)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-2, warmup=1, total_steps=100), mask
    )
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(2), 8)
    ts, _ = step(ts, batch, None)

    # frozen: image tower and text tower identical; trainable: perceiver+adapter
    for a, b in zip(jax.tree.leaves(params["image"]), jax.tree.leaves(ts.params["image"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(params["text"]), jax.tree.leaves(ts.params["text"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params["visual"]["perceiver"]),
                        jax.tree.leaves(ts.params["visual"]["perceiver"]))
    ]
    assert any(moved)
    # trunk of visual tower frozen too (no groups unlocked)
    for a, b in zip(jax.tree.leaves(params["visual"]["trunk"]),
                    jax.tree.leaves(ts.params["visual"]["trunk"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unlock_first_n_layers(setup):
    cfg, params, state = setup
    mask = tri_model_mask(params, cfg, unlock_trans_first_n_layers=1)
    n_all = count_trainable(params, ones_like_mask(params))
    n_mask = count_trainable(params, mask)
    assert 0 < n_mask < n_all
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-2, warmup=1, total_steps=100), mask
    )
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    ts, _ = step(ts, tiny_batch(np.random.RandomState(3), 8), None)
    blocks_before = params["visual"]["trunk"]["blocks"]
    blocks_after = ts.params["visual"]["trunk"]["blocks"]
    qkv_b, qkv_a = blocks_before["attn"]["qkv_w"], blocks_after["attn"]["qkv_w"]
    assert not np.allclose(qkv_b[0], qkv_a[0])  # layer 0 trains
    np.testing.assert_array_equal(qkv_b[1], qkv_a[1])  # layer 1 frozen


def test_accum_freq_step_runs(setup):
    cfg, params, state = setup
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100)
    )
    sc = StepConfig(n_tower=2, align_to="text", accum_freq=2,
                    local_loss=False, compute_dtype=jnp.float32, sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(4), 8)
    ts, metrics = step(ts, batch, None)
    assert np.isfinite(float(metrics["loss"]))


def test_accum_freq_matches_full_batch(setup):
    """Cached-negative replay must produce the SAME gradient as one
    full-batch pass (reference semantics: per-pass backward, unscaled sum)."""
    cfg, params, state = setup
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100)
    )
    batch = tiny_batch(np.random.RandomState(5), 8)

    sc1 = StepConfig(n_tower=3, accum_freq=1, local_loss=False,
                     compute_dtype=jnp.float32, sync_bn=False)
    sc2 = StepConfig(n_tower=3, accum_freq=2, local_loss=False,
                     compute_dtype=jnp.float32, sync_bn=False)
    s1 = make_train_step(cfg, tx, mask, sc1, mesh=None)
    s2 = make_train_step(cfg, tx, mask, sc2, mesh=None)
    t1, m1 = s1(init_train_state(params, state, tx), batch, None)
    t2, m2 = s2(init_train_state(params, state, tx), batch, None)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # Adam normalizes tiny grads by sqrt(v)+eps, amplifying fp32 reduction-
    # order differences between the two computation orders; compare at the
    # scale of one update (lr=1e-3).
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_accum_freq_video_distill_matches_full_batch():
    """accum_freq + video_distill: the cached-splice must carry the token
    grids too (the distill_token loss consumes visual_tokens/image_tokens;
    a features-only merge KeyErrors at trace time), and the per-pass sum
    must still equal the full-batch gradient — distill is per-sample, so
    stop-gradient'd other-micro-batch tokens contribute nothing."""
    from vitlens_tpu.config import make_model_config

    cfg = make_model_config("ViT-Tiny-Test", "video")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100))
    rng = np.random.RandomState(7)
    T = cfg.tower.video.n_frames
    H = cfg.vision.image_size
    frames = rng.randn(4, T, 3, H, H).astype(np.float32)
    text = np.zeros((4, cfg.text.context_length), np.int32)
    text[:, 0], text[:, 1] = 1, 49
    batch = {"image": jnp.asarray(frames), "text": jnp.asarray(text),
             "visual": jnp.asarray(frames)}

    common = dict(n_tower=3, contra_loss_type="distill_token",
                  video_distill=True, local_loss=False,
                  compute_dtype=jnp.float32, sync_bn=False)
    s1 = make_train_step(cfg, tx, mask, StepConfig(accum_freq=1, **common))
    s2 = make_train_step(cfg, tx, mask, StepConfig(accum_freq=2, **common))
    t1, m1 = s1(init_train_state(params, state, tx), batch, None)
    t2, m2 = s2(init_train_state(params, state, tx), batch, None)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
