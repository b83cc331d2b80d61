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


GEN_KW = dict(sot_token_id=1, eos_token_id=63, pad_token_id=0, seq_len=8,
              min_seq_len=1)


def test_coca_generate_modes(setup):
    from vitlens_tpu.models.coca import coca_generate

    cfg, params, state = setup
    images = jnp.asarray(np.random.RandomState(1).randn(2, 3, 28, 28),
                         jnp.float32)
    beam = coca_generate(params, state, images, cfg,
                         generation_type="beam_search", num_beams=4,
                         num_beam_groups=2, **GEN_KW)
    assert beam.shape == (2, 8) and beam.dtype == jnp.int32
    assert np.all(np.asarray(beam[:, 0]) == 1)
    # deterministic
    beam2 = coca_generate(params, state, images, cfg,
                          generation_type="beam_search", num_beams=4,
                          num_beam_groups=2, **GEN_KW)
    assert np.array_equal(np.asarray(beam), np.asarray(beam2))

    for gt, kw in (("top_p", {"top_p": 0.8}), ("top_k", {"top_k": 5})):
        out = np.asarray(coca_generate(
            params, state, images, cfg, generation_type=gt,
            key=jax.random.PRNGKey(0), temperature=0.7, **kw, **GEN_KW))
        assert out.shape == (2, 8)
        assert np.all(out[:, 0] == 1)
        assert np.all((out >= 0) & (out < 64))
        # pad-only after the first EOS (reference appends pad once finished)
        for row in out:
            eos_pos = np.nonzero(row == 63)[0]
            if len(eos_pos):
                assert np.all(row[eos_pos[0] + 1:] == 0)


def test_coca_topk1_and_beam1_match_greedy(setup):
    """top_k=1 sampling and width-1 beam search are both argmax decoding, so
    (until an EOS diverges the bookkeeping) they must match greedy."""
    from vitlens_tpu.models.coca import coca_generate

    cfg, params, state = setup
    images = jnp.asarray(np.random.RandomState(2).randn(2, 3, 28, 28),
                         jnp.float32)
    greedy = np.asarray(coca_generate_greedy(
        params, state, images, cfg, sot_token=1, eot_token=63, seq_len=7))
    topk1 = np.asarray(coca_generate(
        params, state, images, cfg, generation_type="top_k", top_k=1,
        key=jax.random.PRNGKey(3), **GEN_KW))
    beam1 = np.asarray(coca_generate(
        params, state, images, cfg, generation_type="beam_search",
        num_beams=1, num_beam_groups=1, **GEN_KW))
    for b in range(2):
        stop = 8
        eos = np.nonzero(greedy[b] == 63)[0]
        if len(eos):
            stop = min(stop, int(eos[0]))
        stop = min(stop, 7)  # sampler forces EOS at the final position
        assert np.array_equal(topk1[b, :stop], greedy[b, :stop])
        assert np.array_equal(beam1[b, :stop], greedy[b, :stop])


def test_logit_processors_match_hf():
    """The generate() building blocks vs the exact HuggingFace processors the
    reference composes (coca_model.py:204-257)."""
    import torch
    from transformers import (MinLengthLogitsProcessor,
                              RepetitionPenaltyLogitsProcessor,
                              TopKLogitsWarper, TopPLogitsWarper)

    from vitlens_tpu.models.coca import (_min_length_mask,
                                         _repetition_penalty, _top_k_warp,
                                         _top_p_warp)

    rng = np.random.RandomState(0)
    scores = rng.randn(3, 50).astype(np.float32)
    ids = rng.randint(0, 50, (3, 6)).astype(np.int64)
    t_scores = torch.tensor(scores)
    t_ids = torch.tensor(ids)

    ref = MinLengthLogitsProcessor(10, eos_token_id=7)(t_ids, t_scores.clone())
    got = _min_length_mask(jnp.asarray(scores), ids.shape[1], 10, 7)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-6)

    ref = RepetitionPenaltyLogitsProcessor(1.3)(t_ids, t_scores.clone())
    valid = np.ones_like(ids, bool)
    got = _repetition_penalty(jnp.asarray(scores), jnp.asarray(ids), valid,
                              1.3)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-6)

    ref = TopKLogitsWarper(top_k=5)(t_ids, t_scores.clone())
    got = np.asarray(_top_k_warp(jnp.asarray(scores), 5))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-6)

    ref = TopPLogitsWarper(top_p=0.6)(t_ids, t_scores.clone())
    got = np.asarray(_top_p_warp(jnp.asarray(scores), 0.6))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-6)


def test_coca_cls_attn_mask_matches_reference_build_cls_mask():
    """Oracle: the reference TextTransformer.build_cls_mask + causal add
    (transformer.py:871-908) reimplemented with torch F.pad, compared
    cell-for-cell. Only the CLS (last) query row is pad-masked, with keys
    shifted right by one."""
    import torch
    import torch.nn.functional as TF

    from vitlens_tpu.models.coca import coca_cls_attn_mask

    rng = np.random.RandomState(0)
    B, T, pad_id = 3, 7, 0
    text = rng.randint(1, 50, size=(B, T)).astype(np.int64)
    text[0, 4:] = pad_id  # padded caption
    text[1, 6:] = pad_id  # last token padded
    # text[2]: no padding

    # reference: build_attention_mask + build_cls_mask
    seq = T + 1
    causal = torch.full((seq, seq), float("-inf"))
    causal.triu_(1)
    cls_mask = (torch.from_numpy(text) != pad_id).unsqueeze(1)  # [B,1,T]
    cls_mask = TF.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=1.0)
    additive = torch.zeros(cls_mask.shape)
    additive.masked_fill_(~cls_mask, float("-inf"))
    want = (causal[None] + additive).numpy()  # [B, seq, seq]

    got = np.asarray(coca_cls_attn_mask(jnp.asarray(text.astype(np.int32)),
                                        pad_id))[:, 0]
    np.testing.assert_array_equal(got, want)
