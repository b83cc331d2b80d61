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
