"""End-to-end ViTLens API test on the real example assets (random weights —
validates the full file -> processor -> tower -> embedding flow; numeric
golden parity requires the released checkpoints, loaded the same way)."""

import numpy as np
import pytest

import jax

from vitlens_tpu.api import ViTLens
from vitlens_tpu.config import ModalityType

ASSETS = "/root/reference/assets/example"


@pytest.fixture(scope="module")
def model():
    # vitlensB trunk keeps the test fast; same code path as vitlensL
    return ViTLens(
        model_var="vitlensB",
        modality_loaded=["image", "text", "audio", "pc"],
    )


def test_encode_image_text_audio_pc(model):
    inputs = {
        ModalityType.IMAGE: [f"{ASSETS}/image_bird.jpg", f"{ASSETS}/image_dog.jpg"],
        ModalityType.TEXT: ["a bird", "a dog", "sea wave"],
        ModalityType.AUDIO: [f"{ASSETS}/audio_dog.flac"],
        ModalityType.PC: [f"{ASSETS}/pc_car_0260.npy"],
    }
    out = model.encode(inputs, normalize=True)
    assert out["image"].shape == (2, 512)
    assert out["text"].shape == (3, 512)
    assert out["audio"].shape == (1, 512)
    assert out["pc"].shape == (1, 512)
    for k, v in out.items():
        norms = np.linalg.norm(np.asarray(v, np.float32), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5), k

    sim = np.asarray(out["audio"] @ out["text"].T)
    assert sim.shape == (1, 3)
    assert np.all(np.isfinite(sim))


def test_unknown_modality_raises(model):
    with pytest.raises(KeyError):
        model.encode({"thermal": ["x"]})


def test_unnormalized_encode(model):
    out = model.encode({ModalityType.TEXT: ["hello"]}, normalize=False)
    n = float(np.linalg.norm(np.asarray(out["text"])))
    assert n > 0 and abs(n - 1.0) > 1e-3  # genuinely unnormalized
