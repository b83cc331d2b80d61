"""OpenShape/vitlensG training driver.

Reference: /root/reference/VitLens-OpenShape/src/main.py (+ train.py Trainer).
Trains the bigG PNSA Lens against precomputed CLIP text/image embeddings:

  python -m vitlens_tpu.cli.train_openshape \
      --train-files '/data/openshape/*.npy' --epochs 10 --batch-size 16 \
      --use-mask --negative-sample-num 2 \
      --eval-feats /data/mn40_text_feats.npy --eval-labels /data/mn40_labels.npy
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
import time
import numpy as np

import jax
import jax.numpy as jnp
import optax

from vitlens_tpu.data.loader import build_loader
from vitlens_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vitlens_tpu.train import checkpoint as C
from vitlens_tpu.train import openshape as OS
from vitlens_tpu.train.schedules import get_schedule
from vitlens_tpu.utils.logging import MetricsWriter, setup_logging


def build_args(argv=None):
    p = argparse.ArgumentParser("vitlens-tpu openshape trainer")
    p.add_argument("--train-files", type=str, required=False, default=None,
                   help="glob of per-object npy triplet blobs")
    p.add_argument("--out-channel", type=int, default=1280)
    p.add_argument("--skip-first-n-layers", type=int, default=16)
    p.add_argument("--npoints", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--trunk-lr-scale", type=float, default=0.1)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--text-weight", type=float, default=1.0)
    p.add_argument("--image-weight", type=float, default=1.0)
    p.add_argument("--use-mask", action="store_true")
    p.add_argument("--mask-threshold", type=float, default=0.1)
    p.add_argument("--negative-sample-num", type=int, default=1)
    p.add_argument("--wd", type=float, default=0.2,
                   help="AdamW weight decay on ndim>=2 params only "
                        "(reference main.py exclude_wd + train.yaml 0.2)")
    p.add_argument("--use-text-proj", action="store_true")
    p.add_argument("--use-image-proj", action="store_true")
    # reference config model.name: the shipped CLIPBind Lens tower or a
    # comparison baseline (VitLens-OpenShape/src/models/__init__.py)
    p.add_argument("--pc-model", default="clipbind",
                   choices=["clipbind", "PointBERT", "DGCNN", "PointNet"])
    p.add_argument("--pc-scaling", type=int, default=3)
    p.add_argument("--pc-in-channel", type=int, default=6)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--logs", default="./logs")
    p.add_argument("--name", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-feats", default=None,
                   help="npy of precomputed per-class text embeddings")
    p.add_argument("--eval-labels", default=None)
    p.add_argument("--eval-files", default=None)
    p.add_argument("--log-every-n-steps", type=int, default=50)
    # test-scale overrides
    p.add_argument("--tiny", action="store_true", help="tiny tower (tests)")
    return p.parse_args(argv)


def tower_config(args):
    if not args.tiny:
        return OS.vitlensG_tower_config(args.out_channel,
                                        args.skip_first_n_layers)
    from dataclasses import replace

    from vitlens_tpu.config import PerceiverConfig, PointAdapterConfig, VisionArch

    base = OS.vitlensG_tower_config(args.out_channel, 1)
    return replace(
        base,
        arch=VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                        head_width=16),
        embed_dim=16, skip_first_n_layers=None,
        point=PointAdapterConfig(tokenizer="pnsa", num_group=8, group_size=4,
                                 encoder_dims=16, trans_dim=16, in_channel=6,
                                 npoints=args.npoints),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=32,
                                  input_dim=16, cross_heads=1,
                                  cross_dim_head=8, latent_heads=2,
                                  latent_dim_head=8),
    )


def main(argv=None) -> int:
    args = build_args(argv)
    name = args.name or f"openshape_{time.strftime('%Y%m%d_%H%M%S')}"
    log_dir = os.path.join(args.logs, name)
    setup_logging(os.path.join(log_dir, "out.log"))

    tower = tower_config(args)
    dt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.pc_model == "clipbind":
        params, state = OS.clip_bind_init(jax.random.PRNGKey(args.seed),
                                          tower, args.out_channel)
        lr_scale = OS.trunk_lr_scale(params, args.trunk_lr_scale)
    else:
        params, state = OS.baseline_bind_init(
            jax.random.PRNGKey(args.seed), args.pc_model,
            in_channel=args.pc_in_channel, out_channel=args.out_channel,
            scaling=args.pc_scaling)
        lr_scale = jax.tree.map(lambda _: jnp.asarray(1.0), params)

    files = sorted(glob.glob(args.train_files)) if args.train_files else []
    if not files:
        # eval-only mode (reference inference.py:77-230)
        if args.resume:
            host = {"params": params, "state": state}
            host = C.load_checkpoint(args.resume, host)
            params, state = host["params"], host["state"]
            logging.info(f"loaded {args.resume}")
        if args.eval_feats and args.eval_files and args.eval_labels:
            _run_eval(args, params, state, tower, dt,
                      MetricsWriter(log_dir), 0)
            return 0
        logging.info("no training files and no eval spec; nothing to do")
        return 0
    start_epoch = 0
    if args.resume:
        # honor --resume in TRAIN mode too (weights + model state; the
        # checkpoint stores no optimizer state, so optimizer/schedule
        # restart — logged so the warm start is explicit)
        path = (C.get_latest_checkpoint(os.path.join(log_dir, "checkpoints"))
                if args.resume == "latest" else args.resume)
        if path:
            host = C.load_checkpoint(path, {"params": params, "state": state})
            params, state = host["params"], host["state"]
            start_epoch = int((C.load_meta(path) or {}).get("epoch", 0))
            logging.info(f"resumed openshape weights from {path} (epoch "
                         f"{start_epoch}); optimizer state restarts fresh")
        elif args.resume != "latest":
            raise FileNotFoundError(args.resume)
    ds = OS.OpenShapeTripletDataset(files, npoints=args.npoints,
                                    seed=args.seed)
    devices = jax.devices()
    mesh = make_mesh(devices=devices) if len(devices) > 1 else None
    n_shards = len(devices) if mesh else 1
    info = build_loader(ds, batch_size=args.batch_size * n_shards,
                        shuffle=True, seed=args.seed)

    total_steps = info.num_batches * args.epochs
    sched = get_schedule("cosine", args.lr, args.warmup, total_steps)
    # weight decay on matrices only — the reference excludes ndim<2 /
    # bn / ln / bias / logit_scale from wd (main.py:197-202; all of those
    # are sub-2D here), with wd 0.2 (configs/train.yaml)
    wd_mask = jax.tree.map(lambda l: np.ndim(l) >= 2, params)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=args.wd, mask=wd_mask))
    opt_state = tx.init(params)

    # Mask semantics (reference train.py:241-285): the sim-margin mask is
    # OR'd with mask_other = eye|~kron(eye(s), 1_kxk). With k=1 mask_other
    # is ALL-ONES, i.e. use_mask is a no-op; with k>1 it drops same-kNN-
    # group negatives unless the teacher margin exceeds the threshold —
    # which requires the loader to deliver consecutive k-sized kNN groups.
    # OpenShapeTripletDataset yields independent objects, so k>1 would
    # zero arbitrary unrelated pairs: refuse loudly until grouped
    # sampling exists (PARITY.md).
    if args.use_mask:
        if args.negative_sample_num > 1:
            raise NotImplementedError(
                "--use-mask with --negative-sample-num > 1 needs kNN-"
                "grouped batch sampling, which OpenShapeTripletDataset "
                "does not provide; the reference draws k neighbors per "
                "object from its kNN metadata")
        logging.info("--use-mask with negative-sample-num=1 is a no-op "
                     "(reference mask_other = eye|~kron is all-ones at "
                     "k=1); continuing unmasked")

    axis = "data" if mesh else None

    def loss_fn(p, s, batch, fps_key):
        mask = None
        return OS.openshape_loss(
            p, s, batch, tower,
            text_weight=args.text_weight, image_weight=args.image_weight,
            use_text_proj=args.use_text_proj,
            use_image_proj=args.use_image_proj,
            mask=mask, axis_name=axis, compute_dtype=dt, fps_key=fps_key,
            pc_model=args.pc_model, pc_scaling=args.pc_scaling,
            pc_in_channel=args.pc_in_channel,
        )

    def step(p, s, opt, batch, fps_key):
        (loss, (metrics, new_s)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, s, batch, fps_key)
        if axis:
            grads = jax.lax.pmean(grads, axis)
        updates, new_opt = tx.update(grads, opt, p)
        updates = jax.tree.map(lambda u, sc: u * sc.astype(u.dtype),
                               updates, lr_scale)
        new_p = optax.apply_updates(p, updates)
        metrics = dict(metrics, loss=loss)
        return new_p, new_s, new_opt, metrics

    if mesh:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        step = jax.jit(shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        ))
        params, state, opt_state = (replicate(mesh, x)
                                    for x in (params, state, opt_state))
    else:
        step = jax.jit(step)

    writer = MetricsWriter(log_dir)
    rng = jax.random.PRNGKey(args.seed)
    gstep = start_epoch * info.num_batches
    for epoch in range(start_epoch, args.epochs):
        info.set_epoch(epoch)
        for raw in info.dataloader:
            batch = {k: np.asarray(v) for k, v in raw.items()
                     if k in ("xyz_features", "text_feat", "img_feat")}
            if mesh:
                batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            params, state, opt_state, metrics = step(params, state, opt_state,
                                                     batch, sub)
            gstep += 1
            if gstep % args.log_every_n_steps == 0:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                writer.log(m, gstep)
                logging.info(f"epoch {epoch} step {gstep}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in m.items()))
        host = jax.tree.map(np.asarray, {"params": params, "state": state})
        C.save_checkpoint(os.path.join(log_dir, "checkpoints"), host,
                          epoch + 1)
        if args.eval_feats and args.eval_files and args.eval_labels:
            _run_eval(args, params, state, tower, dt, writer, gstep)
    return 0


def _run_eval(args, params, state, tower, dt, writer, gstep):
    cls_feats = np.load(args.eval_feats)
    labels = np.load(args.eval_labels)
    files = sorted(glob.glob(args.eval_files))
    ds = OS.OpenShapeTripletDataset(files, npoints=args.npoints,
                                    augment=False)

    @jax.jit
    def enc(p, s, x):
        if args.pc_model == "clipbind":
            f, _ = OS.clip_bind_apply(p, s, x, tower, compute_dtype=dt)
        else:
            f, _ = OS.baseline_bind_apply(
                p, s, x, args.pc_model, in_channel=args.pc_in_channel,
                out_channel=cls_feats.shape[-1], scaling=args.pc_scaling)
        return f

    info = build_loader(ds, batch_size=args.batch_size, shuffle=False,
                        drop_last=False)
    preds = []
    for raw in info.dataloader:
        x = jnp.asarray(np.asarray(raw["xyz_features"]))
        preds.append(np.asarray(enc(params, state, x), np.float32))
    out = OS.precomputed_text_eval(np.concatenate(preds), labels, cls_feats)
    writer.log(out, gstep, "val")
    logging.info("openshape eval: " + ", ".join(
        f"{k}={v:.4f}" for k, v in out.items()))


if __name__ == "__main__":
    sys.exit(main())
