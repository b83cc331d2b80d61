"""TPU-native BERT text tower vs transformers BertModel (offline: a tiny
BertConfig built from config, no weight download). Mirrors the reference
HFTextEncoder semantics (hf_model.py:107-231)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.models import bert_text as BT
from tests.helpers import rel_err

transformers = pytest.importorskip("transformers")


def _tiny_bert(seed=0):
    import torch

    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=3,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=40, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, hidden_act="gelu")
    torch.manual_seed(seed)
    model = BertModel(cfg)
    model.eval()
    return model, cfg


def test_bert_encoder_parity():
    import torch

    model, cfg = _tiny_bert()
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 99, size=(2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))

    params = BT.convert_hf_bert_state_dict(model.state_dict())
    hidden, pooled = BT.bert_encoder_apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        heads=cfg.num_attention_heads)
    # padded positions differ (torch computes them, we also compute them —
    # compare only the real tokens)
    got = np.asarray(hidden)
    want = out.last_hidden_state.numpy()
    assert rel_err(got[0], want[0]) < 1e-4
    assert rel_err(got[1, :7], want[1, :7]) < 1e-4
    assert rel_err(np.asarray(pooled), out.pooler_output.numpy()) < 1e-4


def test_roberta_encoder_parity():
    """RoBERTa/XLM-R semantics: pad-mask-derived position ids starting at
    padding_idx+1 (modeling_roberta.py create_position_ids_from_input_ids),
    type_vocab_size=1, `roberta.`-prefix stripping."""
    import torch

    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(vocab_size=99, hidden_size=32, num_hidden_layers=3,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0, hidden_act="gelu")
    torch.manual_seed(2)
    model = RobertaModel(cfg)
    model.eval()

    rng = np.random.RandomState(2)
    ids = rng.randint(2, 99, size=(2, 11)).astype(np.int64)
    ids[1, 7:] = 1  # right-padding with roberta's pad id
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))

    sd = {f"roberta.{k}": v for k, v in model.state_dict().items()}
    params = BT.convert_hf_bert_state_dict(sd)
    hidden, pooled = BT.bert_encoder_apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        heads=cfg.num_attention_heads, position_style="roberta", pad_id=1)
    got = np.asarray(hidden)
    want = out.last_hidden_state.numpy()
    assert rel_err(got[0], want[0]) < 1e-4
    assert rel_err(got[1, :7], want[1, :7]) < 1e-4
    assert rel_err(np.asarray(pooled), out.pooler_output.numpy()) < 1e-4

    # bert-style absolute positions would be WRONG for roberta (off by
    # padding_idx+1): the parity above must be attributable to the style
    wrong, _ = BT.bert_encoder_apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        heads=cfg.num_attention_heads, position_style="bert")
    assert rel_err(np.asarray(wrong)[0], want[0]) > 1e-3


@pytest.mark.parametrize("pooler_type", [
    "mean_pooler", "cls_pooler", "cls_last_hidden_state_pooler"])
def test_full_encode_with_poolers(pooler_type):
    import torch

    model, cfg = _tiny_bert(seed=1)
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 99, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[0, 5:] = 0

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))
        if pooler_type == "mean_pooler":
            m = torch.from_numpy(mask).unsqueeze(-1)
            want = (out.last_hidden_state * m).sum(1) / m.sum(1)
        elif pooler_type == "cls_pooler":
            want = out.pooler_output
        else:
            want = out.last_hidden_state[:, 0]

    enc = BT.convert_hf_bert_state_dict(model.state_dict())
    proj = BT.proj_init(jax.random.PRNGKey(0), cfg.hidden_size, 16,
                        proj="mlp")
    feats = BT.bert_text_encode(
        {"encoder": enc, "proj": proj}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), heads=cfg.num_attention_heads,
        pooler_type=pooler_type)
    assert feats.shape == (2, 16)

    pooled = BT.pool(jnp.asarray(out.last_hidden_state.numpy()),
                     jnp.asarray(out.pooler_output.numpy()),
                     jnp.asarray(mask, jnp.int32), pooler_type)
    assert rel_err(np.asarray(pooled), want.numpy()) < 1e-5


def test_hf_text_clip_assembly():
    """roberta-ViT-B-32 (reference model_configs/roberta-ViT-B-32.json) is
    constructible end-to-end: tri_model_init builds the native BERT-family
    text tower and encode_text dispatches to it."""
    from vitlens_tpu.config import get_arch, make_model_config
    from vitlens_tpu.models import tri

    arch = get_arch("roberta-ViT-B-32")
    assert arch["text"].hf_style == "roberta"
    assert arch["text"].vocab_size == 50265

    cfg = make_model_config("roberta-ViT-B-32", "image", quick_gelu=True)
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    assert "encoder" in params["text"] and "proj" in params["text"]

    ids = np.full((2, 9), 1, np.int32)  # roberta pad id
    ids[:, :5] = np.random.RandomState(0).randint(2, 50265, size=(2, 5))
    feats = tri.encode_text(params, jnp.asarray(ids), cfg, normalize=True)
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)


def test_hf_text_train_step():
    """A dual CLIP train step through the hf-style text tower (tiny arch):
    the params tree must be optimizer-safe and grads must flow."""
    from dataclasses import replace

    from vitlens_tpu.config import TextArch
    from vitlens_tpu.models import tri
    from vitlens_tpu.train.freeze import ones_like_mask
    from vitlens_tpu.train.step import (
        OptimizerConfig, StepConfig, init_train_state, make_optimizer,
        make_train_step,
    )
    from tests.test_train_step import tiny_batch, tiny_model_cfg

    cfg = tiny_model_cfg()
    cfg = replace(cfg, text=TextArch(
        context_length=8, vocab_size=50, width=32, heads=2, layers=2,
        hf_style="roberta", hf_intermediate=64, hf_max_positions=16,
        hf_pad_id=0))
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    mask = ones_like_mask(params)
    tx, mask = make_optimizer(params, OptimizerConfig(lr=1e-3, warmup=1,
                                                      total_steps=50), mask)
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(0), 8)
    losses = []
    for _ in range(4):
        ts, metrics = step(ts, batch, None)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # text params actually moved
    a = np.asarray(params["text"]["encoder"]["embeddings"]["word"])
    b = np.asarray(ts.params["text"]["encoder"]["embeddings"]["word"])
    assert np.abs(a - b).max() > 0


def test_convert_hf_text_tower():
    """open_clip CustomTextCLIP HFTextEncoder subtree (text.transformer.* +
    text.proj.{0,2}) converts and reproduces torch end-to-end."""
    import torch

    from transformers import RobertaConfig, RobertaModel

    from vitlens_tpu.weights.torch_convert import convert_hf_text_tower

    cfg = RobertaConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0, hidden_act="gelu")
    torch.manual_seed(3)
    model = RobertaModel(cfg)
    model.eval()
    proj = torch.nn.Sequential(
        torch.nn.Linear(32, 24, bias=False), torch.nn.GELU(),
        torch.nn.Linear(24, 16, bias=False))

    sd = {f"transformer.{k}": v for k, v in model.state_dict().items()}
    sd.update({f"proj.{k}": v for k, v in proj.state_dict().items()})
    params = convert_hf_text_tower(sd)

    rng = np.random.RandomState(3)
    ids = rng.randint(2, 99, size=(2, 7)).astype(np.int64)
    ids[0, 5:] = 1
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask))
        m = torch.from_numpy(mask).unsqueeze(-1)
        pooled = (out.last_hidden_state * m).sum(1) / m.sum(1)
        want = proj(pooled).numpy()

    got = np.asarray(BT.bert_text_encode(
        params, jnp.asarray(ids, jnp.int32), None, heads=4,
        pooler_type="mean_pooler", position_style="roberta", pad_id=1))
    assert rel_err(got, want) < 1e-4


def test_random_init_and_jit():
    p = BT.bert_encoder_init(jax.random.PRNGKey(0), vocab_size=50, hidden=16,
                             layers=2, heads=2, intermediate=32,
                             max_positions=12)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (3, 12)),
                      jnp.int32)
    proj = BT.proj_init(jax.random.PRNGKey(1), 16, 8)
    fn = jax.jit(lambda ids: BT.bert_text_encode(
        {"encoder": p, "proj": proj}, ids, None, heads=2))
    out = np.asarray(fn(ids))
    assert out.shape == (3, 8) and np.isfinite(out).all()
