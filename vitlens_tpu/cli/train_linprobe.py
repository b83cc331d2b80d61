"""Linear-probe training driver.

Reference: training/linear_probe/linprobe_main.py (504 LoC): frozen Lens
backbone + trainable head, LARS on the head only (MoCo-v3 variant,
linprobe_main.py:283), per-epoch accuracy eval.

  python -m vitlens_tpu.cli.train_linprobe --modality tactile \
      --train-split train_rough --val-split test_rough \
      --lp-ckpt /ckpt/vitlensL_tactile.pt --num-classes 2
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vitlens_tpu.config import make_model_config
from vitlens_tpu.data.loader import build_loader
from vitlens_tpu.models.linear_probe import (
    linear_probe_apply, linear_probe_init, lp_trainable_mask,
    softmax_cross_entropy_loss,
)
from vitlens_tpu.train.freeze import apply_mask
from vitlens_tpu.train.schedules import get_schedule
from vitlens_tpu.utils.logging import MetricsWriter, setup_logging


def build_args(argv=None):
    p = argparse.ArgumentParser("vitlens-tpu linear probe")
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--force-image-size", type=int, default=None)
    p.add_argument("--modality", default="tactile")
    p.add_argument("--train-split", default=None)
    p.add_argument("--val-split", default=None)
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--lp-ckpt", default=None,
                   help="pretrain ckpt; loads the visual.* subtree")
    p.add_argument("--lp-enable-vit-proj", action="store_true")
    p.add_argument("--lp-dropout-rate", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--opt", default="lars", choices=["lars", "adamw"],
                   help="LARS is the reference linprobe optimizer "
                        "(linprobe_main.py:283, MoCo-v3 variant)")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--logs", default="./logs")
    p.add_argument("--name", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=4)
    return p.parse_args(argv)


def _dataset(args, split):
    from vitlens_tpu.data import datasets as D

    m = args.modality
    if m == "tactile":
        return D.TAGDataset(split=split)
    if m == "eeg":
        return D.EEGDataset(split=split)
    if m == "audio":
        return D.create_audio_datasets(split, train="train" in split)[0]
    if m == "depth":
        return D.create_rgbd_datasets(split)[0]
    if m == "pc":
        return D.ModelNetDataset(split="train" if "train" in split else "test")
    raise ValueError(m)


def main(argv=None) -> int:
    args = build_args(argv)
    name = args.name or f"lp_{args.modality}_{time.strftime('%Y%m%d_%H%M%S')}"
    log_dir = os.path.join(args.logs, name)
    setup_logging(os.path.join(log_dir, "out.log"))
    dt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    cfg = make_model_config(args.model, args.modality,
                            force_image_size=args.force_image_size)
    params, state = linear_probe_init(
        jax.random.PRNGKey(args.seed), cfg.tower, args.num_classes,
        enable_vit_proj=args.lp_enable_vit_proj,
    )
    if args.lp_ckpt:
        from vitlens_tpu.weights.torch_convert import (
            convert_vision_tower, load_torch_checkpoint, strip_prefixes, sub,
        )

        sd = strip_prefixes(load_torch_checkpoint(args.lp_ckpt))
        vis_sd = sub(sd, "visual.") if any(
            k.startswith("visual.") for k in sd) else sd
        bb_params, bb_state = convert_vision_tower(vis_sd, cfg.tower)
        params["backbone"] = bb_params
        state["backbone"] = bb_state
        logging.info(f"loaded backbone from {args.lp_ckpt}")

    vk = {"pc": "pc", "audio": "audio", "depth": "depth",
          "tactile": "tactile", "eeg": "eeg"}[args.modality]
    train_ds = _dataset(args, args.train_split)
    info = build_loader(train_ds, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed, num_workers=args.workers)
    total_steps = info.num_batches * args.epochs
    sched = get_schedule("cosine", args.lr, args.warmup, total_steps)
    mask = lp_trainable_mask(params)
    if args.opt == "lars":
        # reference linprobe optimizer (linprobe_main.py:283; MoCo-v3 LARS:
        # no trust scaling / weight decay for <=1-D params)
        nd_mask = jax.tree.map(lambda p: p.ndim > 1, params)
        tx = optax.lars(sched, weight_decay=args.wd,
                        weight_decay_mask=nd_mask, trust_coefficient=0.001,
                        trust_ratio_mask=nd_mask, momentum=0.9)
    else:
        tx = optax.adamw(sched, weight_decay=args.wd)
    opt = tx.init(params)

    @jax.jit
    def step(params, st, opt, x, y, key):
        def loss_fn(p):
            logits, new_st = linear_probe_apply(
                p, st, x, cfg.tower, enable_vit_proj=args.lp_enable_vit_proj,
                train=True, dropout_rate=args.lp_dropout_rate,
                dropout_key=key, compute_dtype=dt,
            )
            return softmax_cross_entropy_loss(logits, y), new_st

        (loss, new_st), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        g = apply_mask(g, mask)
        upd, new_opt = tx.update(g, opt, params)
        upd = apply_mask(upd, mask)
        return optax.apply_updates(params, upd), new_st, new_opt, loss

    @jax.jit
    def infer(params, st, x):
        logits, _ = linear_probe_apply(
            params, st, x, cfg.tower,
            enable_vit_proj=args.lp_enable_vit_proj, train=False,
            compute_dtype=dt,
        )
        return logits

    writer = MetricsWriter(log_dir)
    rng = jax.random.PRNGKey(args.seed)
    if args.val_split:  # build ONCE — dataset construction re-lists files
        val_ds = _dataset(args, args.val_split)
        vinfo = build_loader(val_ds, batch_size=args.batch_size,
                             shuffle=False, drop_last=False,
                             num_workers=args.workers)
    gstep = 0
    for epoch in range(args.epochs):
        info.set_epoch(epoch)
        for raw in info.dataloader:
            x = jnp.asarray(np.asarray(raw[vk]))
            if args.modality == "audio" and x.ndim == 4:
                x = x[:, 0]
            y = jnp.asarray(np.asarray(raw["label"]))
            rng, sub_key = jax.random.split(rng)
            params, state, opt, loss = step(params, state, opt, x, y, sub_key)
            gstep += 1
            if gstep % 50 == 0:
                logging.info(f"epoch {epoch} step {gstep}: loss "
                             f"{float(np.asarray(loss)):.4f}")
        if args.val_split:
            correct = n = 0
            for raw in vinfo.dataloader:
                x = jnp.asarray(np.asarray(raw[vk]))
                if args.modality == "audio" and x.ndim == 4:
                    x = x[:, 0]
                logits = np.asarray(infer(params, state, x))
                pred = logits.argmax(-1)
                correct += int((pred == np.asarray(raw["label"])).sum())
                n += len(pred)
            acc = correct / max(n, 1)
            writer.log({"accuracy": acc}, gstep, "val")
            logging.info(f"epoch {epoch}: val acc {acc:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
