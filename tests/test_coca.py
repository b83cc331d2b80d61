"""CoCa composition: shapes, loss finiteness, greedy generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.config import TextArch, VisionArch
from vitlens_tpu.models.coca import (
    CoCaConfig, MultimodalArch, coca_forward, coca_generate_greedy, coca_init,
    coca_loss,
)


@pytest.fixture(scope="module")
def setup():
    cfg = CoCaConfig(
        embed_dim=32,
        vision=VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                          head_width=16),
        text=TextArch(context_length=12, vocab_size=64, width=32, heads=2,
                      layers=2),
        multimodal=MultimodalArch(width=32, heads=2, layers=2,
                                  context_length=11),
        n_queries=8,
    )
    params, state = coca_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_coca_forward_and_loss(setup):
    cfg, params, state = setup
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 28, 28), jnp.float32)
    text = np.zeros((2, 12), np.int32)
    text[:, 0] = 1
    text[:, 1:5] = rng.randint(2, 60, (2, 4))
    text[:, 5] = 63
    out = coca_forward(params, state, images, jnp.asarray(text), cfg)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    assert out["logits"].shape == (2, 11, 64)
    assert out["labels"].shape == (2, 11)
    contrastive, caption = coca_loss(out, cfg)
    assert np.isfinite(float(contrastive)) and np.isfinite(float(caption))
    # caption loss decreases under a few grad steps on the decoder
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        o = coca_forward(p, state, images, jnp.asarray(text), cfg)
        c1, c2 = coca_loss(o, cfg)
        return c1 + c2

    cur = params
    l0 = float(loss_fn(cur))
    for _ in range(4):
        g = jax.grad(loss_fn)(cur)
        upd, opt = tx.update(g, opt)
        cur = optax.apply_updates(cur, upd)
    assert float(loss_fn(cur)) < l0


def test_coca_generate(setup):
    cfg, params, state = setup
    images = jnp.asarray(np.random.RandomState(1).randn(2, 3, 28, 28),
                         jnp.float32)
    out = coca_generate_greedy(params, state, images, cfg, sot_token=1,
                               eot_token=63, seq_len=5)
    assert out.shape == (2, 6)
    assert np.all(np.asarray(out[:, 0]) == 1)
