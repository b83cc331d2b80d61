"""One-stop inference CLI (reference example.py workflow).

Encode files across modalities and print cross-modal softmax similarity
matrices:

  python -m vitlens_tpu.cli.infer \
      --audio a.flac b.flac --text "a dog" "sea waves" \
      --ckpt audio=/path/vitlensL_audio.pt --ckpt text=/path/clip.bin
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vitlens-tpu inference")
    p.add_argument("--model-var", default="vitlensL",
                   choices=["vitlensL", "vitlensB"])
    for m in ["image", "audio", "pc", "depth", "tactile", "eeg", "video"]:
        p.add_argument(f"--{m}", nargs="*", default=None)
    p.add_argument("--text", nargs="*", default=None)
    p.add_argument("--ckpt", action="append", default=[],
                   help="modality=path (repeatable); use all=path for merged")
    p.add_argument("--logit-scale", type=float, default=100.0)
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard encode batches over an N-chip data mesh "
                        "(0 = single device)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    inputs = {}
    for m in ["image", "audio", "pc", "depth", "tactile", "eeg", "video",
              "text"]:
        v = getattr(args, m)
        if v:
            inputs[m] = v
    if not inputs:
        p.error("no inputs given")

    ckpts = {}
    for spec in args.ckpt:
        k, _, v = spec.partition("=")
        ckpts[k] = v

    from vitlens_tpu.api import ViTLens

    mesh = None
    if args.data_parallel:
        from vitlens_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.data_parallel)

    model = ViTLens(model_var=args.model_var, mesh=mesh,
                    modality_loaded=list(inputs), checkpoints=ckpts)
    out = model.encode(inputs, normalize=True)

    mods = list(out)
    for i in range(len(mods)):
        for j in range(i + 1, len(mods)):
            a, b = mods[i], mods[j]
            sim = np.asarray(out[a] @ out[b].T, np.float64) * args.logit_scale
            sm = np.exp(sim - sim.max(axis=-1, keepdims=True))
            sm = sm / sm.sum(axis=-1, keepdims=True)
            print(f"\n{a} x {b} softmax({args.logit_scale:g} * sim):")
            np.set_printoptions(precision=5, suppress=False)
            print(sm)
    return 0


if __name__ == "__main__":
    sys.exit(main())
