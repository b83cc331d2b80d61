"""End-user demo (reference /root/reference/example.py workflow).

With the released checkpoints this reproduces the README golden similarity
matrices (BASELINE.md); without them the towers run with random weights and
the script demonstrates the API flow.

  python examples/example.py --assets /path/to/assets/example \
      --ckpt audio=/ckpt/vitlensL_audio.pt --ckpt pc=/ckpt/vitlensL_pc.pt \
      --ckpt image=/ckpt/clip_vitL14.bin --ckpt text=/ckpt/clip_vitL14.bin
"""

import argparse
import os
import sys

import numpy as np

# allow running from a repo checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitlens_tpu import ModalityType, ViTLens  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--assets", default="/root/reference/assets/example")
    p.add_argument("--ckpt", action="append", default=[],
                   help="modality=path (repeatable)")
    p.add_argument("--model-var", default="vitlensL")
    args = p.parse_args()
    here = args.assets
    ckpts = dict(s.partition("=")[::2] for s in args.ckpt)

    model = ViTLens(
        model_var=args.model_var,
        modality_loaded=[ModalityType.IMAGE, ModalityType.AUDIO,
                         ModalityType.TEXT, ModalityType.PC],
        checkpoints=ckpts,
    )

    # Example 1: audio x text / audio x image
    inputs_1 = {
        ModalityType.IMAGE: [os.path.join(here, f) for f in
                             ["image_bird.jpg", "image_fire.jpg",
                              "image_dog.jpg", "image_beach.jpg"]],
        ModalityType.AUDIO: [os.path.join(here, f) for f in
                             ["audio_chirping_birds.flac",
                              "audio_crackling_fire.flac",
                              "audio_dog.flac", "audio_sea_wave.flac"]],
        ModalityType.TEXT: ["a bird", "crackling fire", "a dog", "sea wave"],
    }
    out1 = model.encode(inputs_1, normalize=True)
    out1 = {k: np.asarray(v, np.float64) for k, v in out1.items()}

    def softmax100(a, b):
        s = 100 * a @ b.T
        e = np.exp(s - s.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    np.set_printoptions(precision=5, suppress=False)
    print("Audio x Text:\n", softmax100(out1["audio"], out1["text"]))
    print("Audio x Image:\n", softmax100(out1["audio"], out1["image"]))

    # Example 2: point cloud x text
    inputs_2 = {
        ModalityType.PC: [os.path.join(here, f) for f in
                          ["pc_car_0260.npy", "pc_guitar_0243.npy",
                           "pc_monitor_0503.npy", "pc_person_0102.npy",
                           "pc_piano_0286.npy"]],
        ModalityType.TEXT: ["a car", "a guitar", "a monitor", "a person",
                            "a piano"],
    }
    out2 = model.encode(inputs_2, normalize=True)
    out2 = {k: np.asarray(v, np.float64) for k, v in out2.items()}
    print("PointCloud x Text:\n", softmax100(out2["pc"], out2["text"]))


if __name__ == "__main__":
    main()
