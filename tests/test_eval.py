"""Eval harness tests: metric parity vs reference/sklearn, classifier
builder semantics, end-to-end zero-shot on a synthetic separable problem."""

import numpy as np
import pytest

from vitlens_tpu.eval import metrics as M
from vitlens_tpu.eval.zero_shot import (
    build_zero_shot_classifier,
    classification_eval,
    map_eval,
    retrieval_eval,
)


def test_ap_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(0)
    for _ in range(5):
        t = (rng.rand(100) > 0.7).astype(np.float64)
        s = rng.rand(100)
        ours = M.average_precision(t, s)
        want = average_precision_score(t, s)
        assert abs(ours - want) < 1e-10


def test_map_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(1)
    t = (rng.rand(64, 10) > 0.8).astype(np.float64)
    t[:, 3] = 1  # ensure every class has a positive
    logits = rng.randn(64, 10)
    m = M.MAP()
    m.compute(np.arange(32), logits[:32], t[:32])
    m.compute(np.arange(32, 64), logits[32:], t[32:])
    got = m.merge_results()["map"]
    want = np.mean(
        average_precision_score(t, 1 / (1 + np.exp(-logits)), average=None)
    )
    assert abs(got - want) < 1e-10


def test_accuracy_multihot_and_int():
    a = M.Accuracy()
    logits = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    a.compute(np.arange(3), logits, np.array([0, 1, 1]))
    assert a.merge_results()["accuracy"] == pytest.approx(2 / 3)

    a = M.Accuracy()
    mh = np.array([[1, 0], [0, 1], [1, 1]])
    a.compute(np.arange(3), logits, mh)
    assert a.merge_results()["accuracy"] == pytest.approx(1.0)


def test_recall_matches_reference_semantics():
    """5 items, 2 captions each; deliberately imperfect similarities."""
    rng = np.random.RandomState(2)
    image_feats = np.eye(5, 8, dtype=np.float32)
    text_feats = np.concatenate([np.eye(5, 8), np.eye(5, 8)]).astype(np.float32)
    text_feats += rng.randn(*text_feats.shape).astype(np.float32) * 0.05
    text_ids = np.array(list(range(5)) * 2)
    rec = M.Recall(text_ids, text_feats)
    rec.compute(np.arange(5), image_feats)
    out = rec.merge_results()
    assert out["txt_r1"] >= 80.0
    assert out["img_r10"] == 100.0
    assert out["img_count"] == 5 and out["txt_count"] == 10


def _toy_encoders(d=16, n_classes=4, seed=0):
    """Synthetic modality: class c visual input = onehot-ish vector; text
    prompts mapping to the same directions."""
    rng = np.random.RandomState(seed)
    anchors = rng.randn(n_classes, d).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)

    def encode_visual(x):  # x: [B] class ids as float "inputs"
        idx = np.asarray(x).astype(int).reshape(-1)
        noisy = anchors[idx] + 0.05 * rng.randn(len(idx), d).astype(np.float32)
        return noisy

    def tokenizer(texts):
        # map "class k ..." prompt to k
        return np.array([[int(t.split()[1])] for t in texts])

    def encode_text(tok):
        return anchors[tok[:, 0]]

    return encode_visual, encode_text, tokenizer, anchors


def test_zero_shot_classification_end_to_end():
    encode_visual, encode_text, tokenizer, _ = _toy_encoders()
    classifier = build_zero_shot_classifier(
        encode_text, tokenizer,
        classnames=["0", "1", "2", "3"],
        templates=["class {} a", "class {} b"],
    )
    assert classifier.shape == (4, 16)
    rng = np.random.RandomState(3)
    targets = rng.randint(0, 4, size=40)
    batches = [(np.arange(40), targets.astype(np.float32), targets)]
    out = classification_eval(encode_visual, batches, classifier,
                              classnames=["a", "b", "c", "d"])
    assert out["accuracy"] > 0.9
    assert out["top5" if 5 in (1, 5) else "top1"] >= out["top1"]
    assert set(out["per_class_top1"]) <= {"a", "b", "c", "d"}


def test_map_eval_end_to_end():
    encode_visual, encode_text, tokenizer, _ = _toy_encoders()
    classifier = build_zero_shot_classifier(
        encode_text, tokenizer, ["0", "1", "2", "3"], ["class {}"])
    targets = np.zeros((20, 4))
    ids = np.random.RandomState(4).randint(0, 4, 20)
    targets[np.arange(20), ids] = 1
    out = map_eval(encode_visual, [(np.arange(20), ids.astype(np.float32),
                                    targets)], classifier)
    assert out["map"] > 0.9


def test_retrieval_eval_end_to_end():
    encode_visual, encode_text, tokenizer, _ = _toy_encoders()
    texts = [f"class {i} x" for i in range(4)]
    out = retrieval_eval(
        encode_visual, encode_text, tokenizer,
        batches=[(np.arange(4), np.arange(4).astype(np.float32))],
        texts=texts, text_ids=list(range(4)),
    )
    assert out["r_mean"] > 90.0


def test_cond_accuracy_matches_reference():
    """cond-merged top-k vs reference cond_acc (zero_shot.py:62-81)."""
    import importlib.util
    import torch

    spec_path = "/root/reference/vitlens/src/training/zero_shot.py"
    src = open(spec_path).read()
    # extract just the cond_acc function to avoid the module's heavy imports
    import re as _re
    m = _re.search(r"def cond_acc.*?return res, correct", src, _re.S)
    ns = {"torch": torch}
    exec(m.group(0), ns)
    cond_acc = ns["cond_acc"]

    rng = np.random.RandomState(0)
    logits = rng.randn(32, 12).astype(np.float32)
    targets = rng.randint(0, 12, 32)
    merge = [3, 7]
    (r1, r5), _ = cond_acc(torch.from_numpy(logits),
                           torch.from_numpy(targets).clone(),
                           merge, merge_idx=100, topk=(1, 5))
    got = M.cond_topk_correct(logits, targets, merge, 100, (1, 5))
    assert abs(got[1] * 100.0 / 32 - r1.item()) < 1e-4
    assert abs(got[5] * 100.0 / 32 - r5.item()) < 1e-4


def test_clip_val_metrics_matches_reference():
    """vs reference get_clip_metrics (train.py:997-1014)."""
    import importlib.util
    import re as _re

    import torch

    src = open("/root/reference/vitlens/src/training/zero_shot.py").read()
    src = open("/root/reference/vitlens/src/training/train.py").read()
    m = _re.search(r"def get_clip_metrics.*?return metrics", src, _re.S)
    ns = {"torch": torch, "np": np}
    exec(m.group(0), ns)
    ref_fn = ns["get_clip_metrics"]

    rng = np.random.RandomState(0)
    img = rng.randn(16, 8).astype(np.float32)
    txt = rng.randn(16, 8).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    want = ref_fn(torch.from_numpy(img), torch.from_numpy(txt),
                  torch.tensor(100.0))
    got = M.clip_val_metrics(img, txt, 100.0)
    for k, v in want.items():
        assert abs(got[k] - float(v)) < 1e-6, k
    assert np.isfinite(got["clip_val_loss"])


def test_ap_matches_sklearn_with_ties():
    """Tied scores must form ONE threshold (sklearn semantics): a
    per-sample cumsum would make AP depend on input order whenever scores
    collide (quantized/saturated logits)."""
    from sklearn.metrics import average_precision_score

    from vitlens_tpu.eval.metrics import average_precision

    rng = np.random.RandomState(0)
    for _ in range(100):
        n = rng.randint(2, 40)
        t = (rng.rand(n) < 0.4).astype(float)
        if t.sum() == 0:
            continue
        s = np.round(rng.rand(n), 1)  # heavy ties
        np.testing.assert_allclose(
            average_precision(t, s), average_precision_score(t, s),
            atol=1e-12)
    # order independence on a full tie
    a = average_precision(np.array([1.0, 0.0]), np.array([1.0, 1.0]))
    b = average_precision(np.array([0.0, 1.0]), np.array([1.0, 1.0]))
    assert a == b == 0.5


def test_map_merge_results_empty():
    from vitlens_tpu.eval.metrics import MAP

    out = MAP().merge_results()
    assert out["map"] == 0.0 and out["map_cnt"] == 0
