"""Linear probe: head-only training, BN stats, frozen backbone."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vitlens_tpu.config import (
    EEGAdapterConfig, PerceiverConfig, TowerConfig, VisionArch,
)
from vitlens_tpu.models.linear_probe import (
    linear_probe_apply, linear_probe_init, lp_trainable_mask,
    softmax_cross_entropy_loss,
)
from vitlens_tpu.train.freeze import apply_mask


def _tower():
    arch = VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                      head_width=16)
    return TowerConfig(
        arch=arch, embed_dim=16, modality="eeg",
        eeg=EEGAdapterConfig(chans=8, time_len=16, window_size=1, stride=1),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=32,
                                  input_dim=32, cross_heads=1,
                                  cross_dim_head=8, latent_heads=2,
                                  latent_dim_head=8),
    )


def test_linear_probe_trains_head_only():
    tower = _tower()
    params, state = linear_probe_init(jax.random.PRNGKey(0), tower,
                                      num_classes=5)
    # without vit proj the head input dim is the trunk width
    assert params["lp_head"]["w"].shape == (32, 5)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8, 16), jnp.float32)
    y = jnp.asarray(rng.randint(0, 5, 8))

    mask = lp_trainable_mask(params)
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)

    def loss_fn(p, s):
        logits, new_s = linear_probe_apply(p, s, x, tower, train=True,
                                           dropout_rate=0.0)
        return softmax_cross_entropy_loss(logits, y), new_s

    losses = []
    cur = params
    cur_state = state
    for _ in range(8):
        (l, cur_state), g = jax.value_and_grad(loss_fn, has_aux=True)(cur, cur_state)
        g = apply_mask(g, mask)
        upd, opt_state = tx.update(g, opt_state, cur)
        upd = apply_mask(upd, mask)
        cur = optax.apply_updates(cur, upd)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    # backbone untouched
    for a, b in zip(jax.tree.leaves(params["backbone"]),
                    jax.tree.leaves(cur["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN running stats updated
    assert not np.allclose(np.asarray(cur_state["head_bn"]["mean"]), 0.0)

    # eval mode uses running stats deterministically
    logits1, _ = linear_probe_apply(cur, cur_state, x, tower, train=False)
    logits2, _ = linear_probe_apply(cur, cur_state, x, tower, train=False)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))


def test_linear_probe_with_vit_proj():
    tower = _tower()
    params, state = linear_probe_init(jax.random.PRNGKey(1), tower,
                                      num_classes=3, enable_vit_proj=True)
    assert params["lp_head"]["w"].shape == (16, 3)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 16), jnp.float32)
    logits, _ = linear_probe_apply(params, state, x, tower,
                                   enable_vit_proj=True)
    assert logits.shape == (2, 3)


def test_lars_matches_reference_optimizer():
    """optax.lars configured as in the linprobe CLI == the reference MoCo-v3
    LARS (training/optimizer.py:14-60): wd + trust scaling only for >1-D
    params, momentum 0.9, trust coefficient 0.001."""
    import importlib.util

    import optax
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_optimizer", "/root/reference/vitlens/src/training/optimizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    shapes = [(8, 4), (4,), (6, 3), (3,)]
    init = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads = [[rng.randn(*s).astype(np.float32) for s in shapes]
             for _ in range(5)]

    tp = [torch.nn.Parameter(torch.tensor(a)) for a in init]
    ref_opt = mod.LARS(tp, lr=0.1, weight_decay=0.01)
    for g in grads:
        for p, gg in zip(tp, g):
            p.grad = torch.tensor(gg)
        ref_opt.step()

    params = {f"p{i}": jnp.asarray(a) for i, a in enumerate(init)}
    nd_mask = jax.tree.map(lambda p: p.ndim > 1, params)
    tx = optax.lars(0.1, weight_decay=0.01, weight_decay_mask=nd_mask,
                    trust_coefficient=0.001, trust_ratio_mask=nd_mask,
                    momentum=0.9)
    st = tx.init(params)
    for g in grads:
        gt = {f"p{i}": jnp.asarray(a) for i, a in enumerate(g)}
        upd, st = tx.update(gt, st, params)
        params = optax.apply_updates(params, upd)

    for i, p in enumerate(tp):
        np.testing.assert_allclose(np.asarray(params[f"p{i}"]),
                                   p.detach().numpy(), rtol=1e-5, atol=1e-6)
