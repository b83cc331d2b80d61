"""End-to-end LEARNING proof (VERDICT r3 item 2): train a tiny model from
scratch through the REAL `cli/train.py` path — audio decode -> clip sample ->
Kaldi fbank -> caption tokenize -> dual InfoNCE vs the frozen text anchor,
with the reference freeze recipe (trunk locked, Lens/adapter trainable) —
until ZERO-SHOT accuracy on held-out fixture samples beats chance by a wide
margin.

This is the offline analogue of the reference's published accuracy table
(MODEL_ZOO.md): it proves the whole loop EXTRACTS SIGNAL, not just that one
epoch's loss went down (tests/test_train_step.py only asserts the latter).
4 classes of pure tones (chance = 0.25); the run must reach top1 >= 0.9 on
a held-out ESC50-style fold. Reference recipe shape: audio_main.py (train)
+ zero_shot.py:641-699 (eval dispatch on eval_metric="acc").
"""

import json
import os
import wave

import numpy as np
import pytest

SR = 16000
DUR = 2.0
# spectrally well-separated tones; fbank (128 mel bins @ 16 kHz) resolves all
FREQS = {0: 300.0, 1: 800.0, 2: 2000.0, 3: 5000.0}
NAMES = {0: "dog", 1: "cat", 2: "bird", 3: "rain"}


def _write_wav(path, cls, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * DUR)) / SR
    x = 0.5 * np.sin(2 * np.pi * FREQS[cls] * t + rng.uniform(0, 2 * np.pi))
    x += 0.02 * rng.randn(len(t))
    with wave.open(str(path), "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.mark.slow
def test_overfit_to_zero_shot_accuracy(tmp_path, monkeypatch):
    from vitlens_tpu.cli.train import main

    # -- fixture: 16 train wavs (AudioSet-style, 4 classes), 8 held-out val
    # wavs (ESC50-style fold) with DIFFERENT phases/noise seeds ------------
    audio_tr = tmp_path / "audioset" / "audio"
    audio_va = tmp_path / "esc50" / "audio"
    meta = tmp_path / "meta" / "modal_audio" / "data"
    for d in (audio_tr, audio_va, meta):
        d.mkdir(parents=True)

    train_anno = []
    for i in range(16):
        c = i % 4
        _write_wav(audio_tr / f"t{i}.wav", c, seed=i)
        train_anno.append({"uniq_id": i,
                           "audio_path": f"audioset/audio/t{i}.wav",
                           "labels": [c]})
    (meta / "audioset_train.json").write_text(json.dumps(train_anno))
    (meta / "audioset_class_labels_indices.csv").write_text(
        "index,mid,display_name\n"
        + "".join(f"{i},/m/{i},{NAMES[i]}\n" for i in range(4)))

    val_anno = []
    for i in range(8):
        c = i % 4
        _write_wav(audio_va / f"v{i}.wav", c, seed=1000 + i)
        val_anno.append({"uniq_id": i, "audio_path": f"esc50/audio/v{i}.wav",
                         "text": "x", "class_label": c})
    (meta / "esc50_fold-1.json").write_text(json.dumps(val_anno))
    (meta / "esc50_label.json").write_text(
        json.dumps({str(i): [NAMES[i]] for i in range(4)}))

    monkeypatch.setenv("VITLENS_AUDIO_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("VITLENS_METADATA_DIR", str(tmp_path / "meta"))

    # -- train: from-scratch tiny model, frozen random text anchor, the
    # default ViT-Lens freeze recipe (trunk locked, Lens/adapter trainable);
    # aug mostly off so ~50 steps suffice. batch-size is PER-SHARD and the
    # conftest forces 8 virtual CPU devices, so the sharded train step runs
    # at global batch 16 over an 8-way data mesh --------------------------
    rc = main(["--modality", "audio", "--model", "ViT-Tiny-Test",
               "--train-data", "audioset@train", "--val-data", "esc50@fold-1",
               "--n-tower", "2", "--align-to", "text",
               "--batch-size", "2", "--epochs", "50", "--warmup", "4",
               "--lr", "1e-3", "--precision", "fp32",
               "--audio-freqm", "0", "--audio-timem", "0",
               "--audio-noise-aug", "false", "--audio-mix-up", "false",
               "--val-frequency", "10", "--workers", "0",
               "--log-every-n-steps", "1",
               "--logs", str(tmp_path / "logs"), "--name", "ovf"])
    assert rc == 0

    recs = [json.loads(l) for l in
            (tmp_path / "logs" / "ovf" / "results.jsonl"
             ).read_text().splitlines()]
    accs = [r["val/esc50@fold-1/top1"] for r in recs
            if "val/esc50@fold-1/top1" in r]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert accs and losses

    # the whole loop extracts signal: held-out zero-shot accuracy ends
    # >= 0.9 with chance at 0.25 (4 classes)
    assert accs[-1] >= 0.9, f"val top1 stayed at {accs}"
    # and the contrastive loss actually moved (not an eval-side artifact)
    assert np.mean(losses[-3:]) < losses[0] - 0.3, losses


# ---------------------------------------------------------------------------
# pc tri path (VERDICT r4 item 3): the numerically riskiest pipeline —
# in-graph FPS + kNN + grouping, PointBERT BatchNorm state, THREE-tower
# tri loss (pc <-> frozen image anchor + pc <-> frozen text anchor) — must
# also extract signal from scratch, through the real cli/train.py, to
# held-out ModelNet-style zero-shot accuracy. Reference recipe shape:
# pc_tri_main.py (train) + zero_shot.py:155-257 (3D acc eval dispatch).
# ---------------------------------------------------------------------------

PC_NAMES = {0: "sphere", 1: "ball", 2: "disk", 3: "string"}


def _make_cloud(cls, seed, n=128):
    """4 shape classes separable by intrinsic geometry (invariant to the
    train aug chain's dropout/scale/shift): unit SHELL, uniform BALL,
    flat DISK, 1-D STRING."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    if cls == 0:      # sphere shell: all radii 1
        pts = v
    elif cls == 1:    # uniform ball volume: r ~ U^(1/3)
        pts = v * rng.rand(n, 1) ** (1 / 3)
    elif cls == 2:    # flat disk in a random-but-fixed-ish plane
        r = np.sqrt(rng.rand(n, 1))
        th = rng.rand(n, 1) * 2 * np.pi
        pts = np.concatenate([r * np.cos(th), r * np.sin(th),
                              0.02 * rng.randn(n, 1)], axis=1)
    else:             # string: 1-D segment
        t = rng.rand(n, 1) * 2 - 1
        pts = np.concatenate([t, 0.02 * rng.randn(n, 2)], axis=1)
    pts += 0.01 * rng.randn(n, 3)
    return pts.astype(np.float32)


def _write_png(path, cls):
    from PIL import Image

    rng = np.random.RandomState(cls)
    base = np.zeros((28, 28, 3), np.uint8)
    base[..., cls % 3] = 220           # class-coded color
    base[::4, :, (cls + 1) % 3] = 180  # plus a stripe pattern
    base += rng.randint(0, 20, base.shape).astype(np.uint8)
    Image.fromarray(base).save(path)


@pytest.mark.slow
def test_pc_tri_overfit_to_zero_shot_accuracy(tmp_path, monkeypatch):
    from vitlens_tpu.cli.train import main

    root = tmp_path / "pcdata"
    meta = tmp_path / "meta" / "modal_3d" / "data"
    for d in (root / "pc", root / "img", meta):
        d.mkdir(parents=True)

    # templates for both the triplet train captions (shapenet_64 set) and
    # the ModelNet eval classifier (modelnet40_64 set)
    (meta / "templates.json").write_text(json.dumps({
        "shapenet_64": ["a point cloud of {}.", "a 3D model of {}."],
        "modelnet40_64": ["a point cloud of {}."],
    }))

    # -- train triplets: 16 (pc, rendered-image, caption) samples ----------
    for c in range(4):
        _write_png(root / "img" / f"c{c}.png", c)
    anno = []
    for i in range(16):
        c = i % 4
        np.save(root / "pc" / f"t{i}.npy", _make_cloud(c, seed=i))
        anno.append({"pc_path": f"pc/t{i}.npy", "image_path": f"img/c{c}.png",
                     "name": PC_NAMES[c]})
    anno_path = tmp_path / "train_triplets.json"
    anno_path.write_text(json.dumps(anno))

    # -- held-out val: ModelNet-style preprocessed .dat pickle -------------
    import pickle

    val_pts = [_make_cloud(i % 4, seed=2000 + i) for i in range(8)]
    val_lbl = [np.array([i % 4]) for i in range(8)]
    with open(root / "modelnet40_test_8192pts_fps.dat", "wb") as f:
        pickle.dump((val_pts, val_lbl), f)
    (root / "modelnet40_shape_names.txt").write_text(
        "".join(PC_NAMES[i] + "\n" for i in range(4)))

    monkeypatch.setenv("VITLENS_PC_DATA_DIR", str(root))
    monkeypatch.setenv("VITLENS_METADATA_DIR", str(tmp_path / "meta"))

    # -- train: from-scratch tiny tri model; frozen random image + text
    # anchors, Lens/adapter trainable (default locks); tiny PointBERT
    # geometry (FPS 16 groups of 8 from 128 points, in-graph) -------------
    rc = main(["--modality", "pc", "--model", "ViT-Tiny-Test",
               "--train-data", str(anno_path), "--val-data", "modelnet",
               "--n-tower", "3",
               "--pc-npoints", "128", "--pc-num-group", "16",
               "--pc-group-size", "8", "--pc-encoder-dims", "24",
               "--pc-trans-dim", "32",
               "--batch-size", "2", "--epochs", "60", "--warmup", "4",
               "--lr", "2e-3", "--precision", "fp32",
               "--val-frequency", "15", "--workers", "0",
               "--log-every-n-steps", "1",
               "--logs", str(tmp_path / "logs"), "--name", "pcovf"])
    assert rc == 0

    recs = [json.loads(l) for l in
            (tmp_path / "logs" / "pcovf" / "results.jsonl"
             ).read_text().splitlines()]
    accs = [r["val/modelnet/top1"] for r in recs if "val/modelnet/top1" in r]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert accs and losses

    # held-out zero-shot top1 >= 0.9 from chance 0.25
    assert accs[-1] >= 0.9, f"val top1 stayed at {accs}"
    assert np.mean(losses[-3:]) < losses[0] - 0.3, losses
