"""README golden-matrix parity harness (checkpoint-gated).

The reference's de-facto end-to-end regression test is example.py's printed
softmax similarity matrices on assets/example (README "Usage"; SURVEY §6
"Golden numerics"). Released checkpoints are not downloadable in this
environment (zero egress), so these tests SKIP unless VITLENS_CKPT_DIR
points at a directory containing the released weights:

    VITLENS_CKPT_DIR/
      vitlensL_audio.pt      (or a merged vitlensL.pt under key "all")
      vitlensL_pc.pt
      clip_vitL14.pt         (datacomp_xl_s13b_b90k ViT-L-14 trunk; any of
                              the names below)

The moment checkpoints appear, parity is one command:
    VITLENS_CKPT_DIR=/ckpts python -m pytest tests/test_golden_matrices.py
"""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets/example"
CKPT_DIR = os.environ.get("VITLENS_CKPT_DIR", "")

pytestmark = pytest.mark.skipif(
    not CKPT_DIR or not os.path.isdir(CKPT_DIR),
    reason="set VITLENS_CKPT_DIR to the released-checkpoint directory",
)

# README "Usage" expected outputs (SURVEY §6 Golden numerics)
AUDIO_TEXT_DIAG = [0.99998, 1.0, 0.99051, 0.99999]
AUDIO_IMAGE_DIAG = [1.0, 1.0, 0.98212, 0.98876]
PC_TEXT_DIAG = [0.99945, 1.0, 0.99999, 0.99998, 1.0]
TOL = 1e-3

CLIP_NAMES = ("clip_vitL14.pt", "clip_vitL14.bin", "ViT-L-14.pt",
              "open_clip_pytorch_model.bin", "vit_l_14_datacomp.pt")


def _find(*names):
    for n in names:
        p = os.path.join(CKPT_DIR, n)
        if os.path.exists(p):
            return p
    return None


def _ckpt_map():
    merged = _find("vitlensL.pt")
    clip = _find(*CLIP_NAMES) or merged
    audio = _find("vitlensL_audio.pt") or merged
    pc = _find("vitlensL_pc.pt") or merged
    missing = [k for k, v in
               {"clip trunk": clip, "audio": audio, "pc": pc}.items()
               if v is None]
    if missing:
        pytest.skip(f"missing checkpoints in VITLENS_CKPT_DIR: {missing}")
    return {"image": clip, "text": clip, "audio": audio, "pc": pc}


def _softmax100(a, b):
    s = 100.0 * np.asarray(a, np.float64) @ np.asarray(b, np.float64).T
    e = np.exp(s - s.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def model():
    from vitlens_tpu import ModalityType, ViTLens

    return ViTLens(
        model_var="vitlensL",
        modality_loaded=[ModalityType.IMAGE, ModalityType.TEXT,
                         ModalityType.AUDIO, ModalityType.PC],
        checkpoints=_ckpt_map(),
    )


def test_audio_matrices(model):
    out = model.encode({
        "image": [os.path.join(ASSETS, f) for f in
                  ["image_bird.jpg", "image_fire.jpg", "image_dog.jpg",
                   "image_beach.jpg"]],
        "audio": [os.path.join(ASSETS, f) for f in
                  ["audio_chirping_birds.flac", "audio_crackling_fire.flac",
                   "audio_dog.flac", "audio_sea_wave.flac"]],
        "text": ["a bird", "crackling fire", "a dog", "sea wave"],
    }, normalize=True)
    at = _softmax100(out["audio"], out["text"])
    ai = _softmax100(out["audio"], out["image"])
    np.testing.assert_allclose(np.diag(at), AUDIO_TEXT_DIAG, atol=TOL)
    np.testing.assert_allclose(np.diag(ai), AUDIO_IMAGE_DIAG, atol=TOL)


def test_pc_matrix(model):
    out = model.encode({
        "pc": [os.path.join(ASSETS, f) for f in
               ["pc_car_0260.npy", "pc_guitar_0243.npy",
                "pc_monitor_0503.npy", "pc_person_0102.npy",
                "pc_piano_0286.npy"]],
        "text": ["a car", "a guitar", "a monitor", "a person", "a piano"],
    }, normalize=True)
    pt = _softmax100(out["pc"], out["text"])
    np.testing.assert_allclose(np.diag(pt), PC_TEXT_DIAG, atol=TOL)
