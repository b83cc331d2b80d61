"""Training driver.

TPU re-design of the reference per-modality mains
({pc,depth,audio,tactile,eeg}_{main,tri_main}.py, ~6100 LoC of ~95%-identical
code) as ONE driver: build model + mesh + data + loss, run epochs with the
sharded train step, evaluate each epoch, checkpoint latest/best, resume.
Eval-only mode when --train-data is absent (reference audio_main.py:525-535).

Usage:
  python -m vitlens_tpu.cli.train --modality audio --n-tower 3 \
      --train-data audioset@train --val-data esc50@fold-1 ...
  python -m vitlens_tpu.cli.train --modality pc --val-data modelnet40  # eval-only
"""

from __future__ import annotations

import logging
import os
import sys
import time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.cli.args import TrainArgs, parse_args
from vitlens_tpu.config import make_model_config
from vitlens_tpu.data.loader import DataInfo, SyntheticDataset, build_loader
from vitlens_tpu.models import tri
from vitlens_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vitlens_tpu.train import checkpoint as C
from vitlens_tpu.train.freeze import tri_model_mask
from vitlens_tpu.train.step import (
    OptimizerConfig, StepConfig, init_train_state, make_optimizer,
    make_train_step,
)
from vitlens_tpu.utils.logging import (
    MetricsWriter, ThroughputMeter, dump_params, log_param_census, setup_logging,
)

MODALITY_BATCH_KEY = {"pc": "pc", "audio": "audio", "depth": "depth",
                      "tactile": "tactile", "eeg": "eeg", "video": "video"}


def build_train_data(args: TrainArgs, tokenizer, n_shards: int,
                     cfg=None, proc_id: int = 0,
                     n_procs: int = 1) -> Optional[DataInfo]:
    """n_shards = GLOBAL data-parallel replicas. Each process loads its
    1/n_procs slice of the global batch (reference DistributedSampler
    semantics: shard_id=rank) — shard_batch assembles the global array
    from the process-local slices."""
    if not args.train_data:
        return None
    batch = args.batch_size * n_shards // n_procs
    if args.dataset_type == "synthetic":
        spec = _synthetic_spec(args, cfg)
        ds = SyntheticDataset(spec, n=args.train_num_samples or 1024,
                              seed=args.seed)
        return build_loader(ds, batch_size=batch, shard_id=proc_id,
                            n_shards=n_procs, shuffle=True, seed=args.seed,
                            num_workers=args.workers)
    ds = _build_real_dataset(args, args.train_data, train=True, cfg=cfg)
    return build_loader(ds, batch_size=batch, shard_id=proc_id,
                        n_shards=n_procs, shuffle=True, seed=args.seed,
                        num_workers=args.workers)


def _synthetic_spec(args: TrainArgs, cfg=None) -> Dict[str, tuple]:
    hw = cfg.vision.image_size if cfg is not None else 224
    ctx = cfg.text.context_length if cfg is not None else 77
    tower = cfg.tower if cfg is not None else None
    n_frames = (tower.video.n_frames if tower is not None
                and tower.video is not None else 3)
    vis_shapes = {
        "pc": ((tower.point.npoints if tower and tower.point else 8192), 3),
        "audio": ((tower.audio.target_length if tower and tower.audio else 512),
                  (tower.audio.mel_bins if tower and tower.audio else 128)),
        "depth": (1, hw, hw),
        "tactile": (3, hw, hw),
        "eeg": ((tower.eeg.chans if tower and tower.eeg else 128),
                (tower.eeg.time_len if tower and tower.eeg else 512)),
        "video": (n_frames, 3, hw, hw),
    }
    # the video anchor is the video itself through the frame-mean image
    # tower (reference 5-D image input, model.py:542-621)
    img_shape = (n_frames, 3, hw, hw) if args.modality == "video" else (3, hw, hw)
    return {
        "image": (img_shape, "f"),
        "text": ((ctx,), "i"),
        "visual": (vis_shapes[args.modality], "f"),
    }


def _build_real_dataset(args: TrainArgs, spec: str, train: bool,
                        cfg=None):
    from vitlens_tpu.data import datasets as D

    if args.dataset_type == "csv":
        # classic image-text CSV training (reference data.py:150-170)
        from vitlens_tpu.data.loader import CsvDataset
        from vitlens_tpu.data.processors import (
            ImageProcessor,
            TextProcessor,
            TrainImageProcessor,
        )

        size = args.force_image_size or 224
        img_proc = (TrainImageProcessor(image_size=size,
                                        aug_cfg=args.aug_cfg,
                                        seed=args.seed)
                    if train else ImageProcessor(image_size=size))
        # hf-text archs (roberta-ViT-B-32 etc.) must tokenize with their
        # HF tokenizer, not CLIP BPE — same dispatch as main()
        from vitlens_tpu.text.tokenizer import get_tokenizer

        tok = get_tokenizer(
            hf_tokenizer_name=(cfg.text.hf_tokenizer_name
                               if cfg is not None else None))
        return CsvDataset(spec, img_key=args.csv_img_key,
                          caption_key=args.csv_caption_key,
                          sep=args.csv_separator,
                          image_processor=img_proc,
                          text_processor=TextProcessor(tokenizer=tok))
    m = args.modality
    if m == "audio":
        pk = None
        if cfg is not None and cfg.tower.audio is not None:
            a = cfg.tower.audio
            # the fbank geometry follows the model config (2-sec variant etc.)
            pk = dict(sampling_rate=a.sampling_rate,
                      clip_duration=a.clip_duration,
                      target_length=a.target_length, mel_bins=a.mel_bins)
        ak = {}
        if args.audio_freqm is not None:
            ak["freq_mask"] = args.audio_freqm
        if args.audio_timem is not None:
            ak["time_mask"] = args.audio_timem
        if args.audio_noise_aug is not None:
            ak["noise_aug"] = args.audio_noise_aug
        if args.audio_mix_up is not None:
            ak["mixup_prob"] = 0.5 if args.audio_mix_up else 0.0
        return D.create_audio_datasets(spec, train=train, proc_kwargs=pk,
                                       aug_kwargs=ak or None)[0]
    # paired-image processors must match the model's resolution (the image
    # tower pos-emb is sized by it)
    hw = cfg.vision.image_size if cfg is not None else 224
    if m == "depth":
        return D.create_rgbd_datasets(spec, image_size=hw)[0]
    if m == "tactile":
        return D.TAGDataset(split=spec, image_size=hw)
    if m == "eeg":
        return D.EEGDataset(split=spec, image_size=hw)
    if m == "video":
        # spec = path to an annotation json ([{video_path, text|caption,
        # label?}], frame-dir sources); exceeds the reference, which gates
        # video behind unreleased decord loaders (at_processor.py:113-160)
        n_frames = (cfg.tower.video.n_frames
                    if cfg is not None and cfg.tower.video is not None else 8)
        return D.VideoDataset(anno_path=spec, n_frames=n_frames,
                              image_size=hw, train=train,
                              rand_aug=args.vid_rand_aug,
                              rand_aug_n=args.vid_rand_aug_n,
                              rand_aug_m=args.vid_rand_aug_m)
    if m == "pc":
        npoints = (cfg.tower.point.npoints
                   if cfg is not None and cfg.tower.point is not None
                   else 8192)
        if spec.startswith("modelnet"):
            return D.ModelNetDataset()
        if spec.startswith("scanobjectnn"):
            return D.ScanObjectNNDataset()
        if spec.startswith("objaverse"):
            _, _, root = spec.partition("@")
            return D.ObjaverseDataset(root=root or None, augment=train)
        return D.PCTripletDataset(anno_path=spec, augment=train,
                                  npoints=npoints, image_size=hw)
    raise ValueError(m)


def _prep_batch(raw: Dict[str, Any], args: TrainArgs, tokenizer) -> Dict[str, Any]:
    """Map dataset keys -> train-step keys; tokenize captions host-side."""
    batch: Dict[str, Any] = {}
    vk = MODALITY_BATCH_KEY.get(args.modality, "visual")
    vis = raw.get("visual", raw.get(vk))
    if vis is not None:  # absent in classic-CLIP (csv) mode
        batch["visual"] = np.asarray(vis)
        if args.modality == "audio" and batch["visual"].ndim == 4:
            batch["visual"] = batch["visual"][:, 0]  # train uses 1 clip
    if "image" in raw:
        batch["image"] = np.asarray(raw["image"])
    elif (args.modality == "video" and "visual" in batch
          and (args.n_tower == 3 or args.video_distill)):
        # the video anchor IS the video: frames go through the frozen image
        # tower's frame-mean path (reference TriCLIP 5-D image handling,
        # model.py:542-621)
        batch["image"] = batch["visual"]
    if "text" in raw:
        batch["text"] = np.asarray(raw["text"])
    elif "caption_str" in raw:
        batch["text"] = tokenizer(list(raw["caption_str"]))
    if "label" in raw:
        batch["label"] = np.asarray(raw["label"])
    return batch


def evaluate(args: TrainArgs, params, model_state, cfg, tokenizer,
             mesh=None) -> Dict[str, float]:
    """Zero-shot eval on --val-data (dispatch on dataset.eval_metric).

    With a mesh, visual/image encode batches are sharded over the data axis
    so eval touches every chip (the reference shards eval across ranks,
    zero_shot.py:709-788); classifier build stays host-side. Single-device
    numbers are unchanged — padding rows are trimmed before metrics."""
    if not args.val_data:
        return {}
    from vitlens_tpu.eval.zero_shot import (
        build_zero_shot_classifier, classification_eval, map_eval,
        retrieval_eval,
    )

    compute_dtype = _dtype(args)

    _jit_kw = {}
    if mesh is not None:
        from vitlens_tpu.parallel.mesh import (
            _spans_processes, data_sharding, replicated,
        )

        _spans = _spans_processes(mesh)
        # host arrays -> replicate onto the mesh once (replicate() handles
        # meshes spanning processes); arrays already placed (e.g.
        # FSDP-sharded train params) keep their sharding — GSPMD inserts
        # the gathers inside the jit
        def _place(t):
            return jax.tree.map(
                lambda x: x if isinstance(x, jax.Array)
                else replicate(mesh, x), t)

        params, model_state = _place(params), _place(model_state)
        _dsh = data_sharding(mesh)
        _ndata = mesh.shape["data"]
        # features must land replicated: on a multi-host mesh an output
        # sharded over `data` spans non-addressable devices and
        # np.asarray would raise; the forced all-gather is the same data
        # movement the host fetch needs anyway
        _jit_kw = {"out_shardings": replicated(mesh)}

    def _shard_rows(x: np.ndarray):
        """Pad the batch dim to a multiple of the data axis and shard.

        Every rank iterates the SAME val loader (shuffle=False, no rank
        sharding), so on a spans-process mesh each process contributes the
        rows of its own addressable shards out of the identical full
        batch."""
        pad = (-len(x)) % _ndata
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        if _spans:
            return jax.make_array_from_callback(
                x.shape, _dsh, lambda i: x[i])
        return jax.device_put(x, _dsh)

    # params/state are explicit jit args (donating them to a closure would
    # bake the weights into the jaxpr as constants and re-trace every epoch)
    @partial(jax.jit, **_jit_kw)
    def enc_vis(p, s, x):
        feats, _ = tri.encode_visual(p, s, x, cfg, normalize=False,
                                     compute_dtype=compute_dtype)
        return feats

    @partial(jax.jit, **_jit_kw)
    def enc_txt(p, toks):
        return tri.encode_text(p, toks, cfg, normalize=False,
                               compute_dtype=compute_dtype)

    def encode_visual(x):
        x = np.asarray(x)
        if mesh is None:
            return np.asarray(enc_vis(params, model_state, jnp.asarray(x)),
                              np.float32)
        out = np.asarray(enc_vis(params, model_state, _shard_rows(x)),
                         np.float32)
        return out[: len(x)]

    def encode_text(toks):
        # np, not jnp.asarray: a committed local array would clash with
        # params living on a spans-process mesh (numpy inputs are placed
        # replicated by the jit; identical on every rank)
        return np.asarray(enc_txt(params, np.asarray(toks)), np.float32)

    results = {}
    for spec in args.val_data.split("::"):
        if args.dataset_type == "csv":
            # paired image-text val: contrastive val loss + rank metrics
            # (reference evaluate + get_clip_metrics, train.py:766-874)
            from vitlens_tpu.eval.metrics import clip_val_metrics

            ds = _build_real_dataset(args, spec, train=False, cfg=cfg)
            info = build_loader(ds, batch_size=args.batch_size, shuffle=False,
                                num_workers=args.workers, drop_last=False)

            @partial(jax.jit, **_jit_kw)
            def enc_img(p, s, x):
                return tri.encode_image(p, s, x, cfg, normalize=True,
                                        compute_dtype=compute_dtype)

            img_feats, txt_feats = [], []
            for b in info.dataloader:
                img = np.asarray(b["image"])
                ix = (jnp.asarray(img) if mesh is None else _shard_rows(img))
                img_feats.append(np.asarray(
                    enc_img(params, model_state, ix), np.float32)[: len(img)])
                txt_feats.append(np.asarray(
                    enc_txt(params, np.asarray(b["text"])), np.float32))
            tf = np.concatenate(txt_feats)
            tf /= np.maximum(np.linalg.norm(tf, axis=1, keepdims=True), 1e-12)
            # the model's LEARNED scale, not a constant (reference scales
            # val logits with logit_scale.exp(), train.py:790)
            ls = float(np.exp(np.asarray(params["logit_scale"])))
            out = clip_val_metrics(np.concatenate(img_feats), tf,
                                   logit_scale=ls)
            results[spec] = out
            logging.info(f"eval[{spec}]: " + ", ".join(
                f"{k}={v:.4f}" for k, v in out.items()))
            continue
        ds = _build_real_dataset(args, spec, train=False, cfg=cfg)
        vk = MODALITY_BATCH_KEY.get(args.modality, "visual")
        metric = getattr(ds, "eval_metric", "acc")
        clip_mean = args.modality == "audio"

        def batches():
            info = build_loader(ds, batch_size=args.batch_size, shuffle=False,
                                num_workers=args.workers, drop_last=False)
            for b in info.dataloader:
                tgt = (b.get("label") if metric == "acc" else
                       b.get("targets", b.get("label")))
                yield np.asarray(b["id"]), np.asarray(b[vk]), np.asarray(tgt)

        # distributed=False: every rank iterates the FULL val set in
        # lockstep (the collective encode jits require it), so the metric
        # classes' cross-process merge would count each sample n_procs
        # times and deflate retrieval R@K (duplicate gallery entries)
        if metric == "recall":
            out = retrieval_eval(
                encode_visual, encode_text, tokenizer,
                ((i, x) for i, x, _ in batches()),
                texts=ds.texts, text_ids=ds.text_ids, clip_mean=clip_mean,
                distributed=False,
            )
        else:
            classifier = build_zero_shot_classifier(
                encode_text, tokenizer, ds.classnames, ds.templates)
            runner = classification_eval if metric == "acc" else map_eval
            out = runner(encode_visual, batches(), classifier,
                         clip_mean=clip_mean, distributed=False)
        results[spec] = out
        logging.info(f"eval[{spec}]: " + ", ".join(
            f"{k}={v:.4f}" for k, v in out.items()
            if isinstance(v, (int, float))))
    return results


def _apply_tower_overrides(cfg, args: TrainArgs):
    """Per-modality hyperparameter flags (reference params.py:645-935
    audio/pc/eeg/perceiver sections). A flag left at None keeps the vitlensL
    preset; set flags are grafted onto the tower's sub-configs."""
    import dataclasses
    from dataclasses import replace as _r

    tower = cfg.tower
    changed = {}
    for prefix, attr in (("audio", "audio"), ("pc", "point"),
                         ("eeg", "eeg"), ("vid", "video"),
                         ("perceiver", "perceiver")):
        sub = getattr(tower, attr)
        if sub is None:
            continue
        upd = {}
        for f in dataclasses.fields(sub):
            v = getattr(args, f"{prefix}_{f.name}", None)
            if v is not None:
                upd[f.name] = v
        if upd:
            changed[attr] = _r(sub, **upd)
    # the pc preset derives the perceiver's input dim from the tokenizer's
    # trans_dim — keep them in sync unless the user pinned it explicitly
    if (args.pc_trans_dim is not None and args.perceiver_input_dim is None
            and tower.perceiver is not None):
        pcv = changed.get("perceiver", tower.perceiver)
        changed["perceiver"] = _r(pcv, input_dim=args.pc_trans_dim)
    if changed:
        cfg = _r(cfg, tower=_r(tower, **changed))
    return cfg


def _dtype(args: TrainArgs):
    return {"bf16": jnp.bfloat16, "pure_bf16": jnp.bfloat16,
            "fp32": jnp.float32}[args.precision]


def _primary_metric(results: Dict[str, Dict]) -> float:
    """Summed primary metric for save-best (reference keys summed val acc1,
    audio_main.py:599-611)."""
    total = 0.0
    for out in results.values():
        for key in ("accuracy", "map", "r_mean", "image_to_text_R@1"):
            if key in out:
                total += float(out[key])
                break
    return total


def _flatten_results(results: Dict[str, Dict]) -> Dict[str, float]:
    """Flatten per-dataset metric dicts into writer keys (the reference logs
    every val metric to tensorboard/wandb, train.py:861-874). File-path specs
    (csv mode) are reduced to their basename."""
    flat = {}
    for spec, out in results.items():
        name = os.path.basename(spec) if os.path.sep in spec else spec
        for k, v in out.items():
            if isinstance(v, (int, float)):
                flat[f"{name}/{k}"] = float(v)
    return flat


def main(argv=None) -> int:
    """CLI entry point. Wraps the driver so the process-global SIGTERM
    handler the preemption path installs is always restored — in-process
    callers (pytest, embedding apps) must not lose graceful-shutdown-by-
    SIGTERM after a train run returns."""
    import signal

    prev_sigterm = signal.getsignal(signal.SIGTERM)
    try:
        return _main(argv)
    finally:
        try:  # signal() is main-thread-only; elsewhere nothing was installed
            if signal.getsignal(signal.SIGTERM) is not prev_sigterm:
                signal.signal(signal.SIGTERM, prev_sigterm)
        except (ValueError, TypeError):
            pass


def _main(argv=None) -> int:
    args = parse_args(argv)
    try:  # persistent compilation cache (first TPU compiles are expensive)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/vitlens_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    # multi-host bootstrap BEFORE the first backend touch (torchrun/SLURM
    # env discovery, reference training/distributed.py:12-144); no-op when
    # launched single-process
    from vitlens_tpu.parallel.mesh import init_distributed

    pid = init_distributed()
    name = args.name or f"{args.modality}_{args.model}_{time.strftime('%Y%m%d_%H%M%S')}"
    if not args.name and jax.distributed.is_initialized():
        # the timestamp is PER-RANK: a second boundary or clock skew would
        # split the run across different log/ckpt dirs and turn the
        # collective sharded save into per-host writes into different
        # roots — agree on rank 0's name
        from vitlens_tpu.parallel.mesh import broadcast_object

        name = broadcast_object(name)
    log_dir = os.path.join(args.logs, name)
    # rank 0 owns out.log/params.txt (reference is_master gating,
    # training/logger.py); other ranks log to a per-rank file so a shared
    # log dir never interleaves
    setup_logging(os.path.join(
        log_dir, "out.log" if pid == 0 else f"out.rank{pid}.log"))
    if pid == 0:
        dump_params(log_dir, vars(args))

    from vitlens_tpu.text.tokenizer import get_tokenizer

    cfg = make_model_config(
        args.model, args.modality, quick_gelu=args.force_quick_gelu,
        force_image_size=args.force_image_size,
        skip_first_n_layers=args.skip_trans_first_n_layers,
    )
    # hf-text archs (roberta-ViT-B-32 etc.) tokenize with their HF
    # tokenizer (reference factory.get_tokenizer dispatch on hf_tokenizer_name)
    tokenizer = get_tokenizer(
        hf_tokenizer_name=cfg.text.hf_tokenizer_name)
    cfg = _apply_tower_overrides(cfg, args)
    if args.force_patch_dropout is not None:
        from dataclasses import replace as _replace

        cfg = _replace(cfg, tower=_replace(
            cfg.tower, patch_dropout=args.force_patch_dropout))
    params, model_state = tri.tri_model_init(jax.random.PRNGKey(args.seed), cfg)
    if args.pretrained:
        from vitlens_tpu.factory import _merge
        from vitlens_tpu.weights.torch_convert import (
            convert_tri_state_dict, load_torch_checkpoint,
        )

        path = args.pretrained
        if not os.path.exists(path):
            from vitlens_tpu.utils.hub import resolve_pretrained

            path = resolve_pretrained(args.model, args.pretrained)
        sd = load_torch_checkpoint(path)
        lp, ls = convert_tri_state_dict(sd, cfg)
        params, model_state = _merge(params, lp), _merge(model_state, ls)
        logging.info(f"loaded pretrained {args.pretrained}")

    devices = jax.devices()[: args.n_devices] if args.n_devices else jax.devices()
    if args.tp > 1:
        if len(devices) % args.tp:
            raise SystemExit(
                f"--tp {args.tp} does not divide {len(devices)} devices")
        mesh = make_mesh(n_data=len(devices) // args.tp, n_model=args.tp,
                         devices=devices)
    else:
        mesh = make_mesh(devices=devices) if len(devices) > 1 else None
    # data-parallel replicas (per-replica batch semantics, like the
    # reference's per-rank batch); under TP this is n_devices / tp
    n_shards = int(mesh.shape["data"]) if mesh is not None else 1
    n_chips = len(devices) if mesh is not None else 1

    mask = tri_model_mask(
        params, cfg,
        lock_image=args.lock_image, lock_text=args.lock_text,
        lock_visual=args.lock_visual,
        visual_unlocked_groups=args.lock_visual_unlocked_groups,
        unlock_from_head=args.unlock_from_head, unlock_cls=args.unlock_cls,
        unlock_pos_emb=args.unlock_pos_emb,
        unlock_trans_first_n_layers=args.unlock_trans_first_n_layers,
    )
    if args.lora_rank > 0:
        # LoRA fine-tuning (train/lora.py): inject rank-r factors into the
        # selected towers and train ONLY them — the mask override supersedes
        # those towers' lock flags.
        from vitlens_tpu.train.lora import lora_init, lora_mask

        params = dict(params)
        mask = dict(mask)
        towers = list(dict.fromkeys(  # strip + dedup, order-preserving
            t.strip() for t in args.lora_towers.split(",") if t.strip()))
        for i, tower in enumerate(towers):
            if tower not in ("visual", "text"):
                raise SystemExit(f"--lora-towers: unknown tower {tower!r}")
            params[tower] = dict(params[tower])
            params[tower]["lora"] = lora_init(
                jax.random.PRNGKey(args.seed + 17 + i), params[tower],
                args.lora_rank, alpha=args.lora_alpha,
                targets=tuple(t.strip() for t in args.lora_targets.split(",") if t.strip()))
            mask[tower] = lora_mask(params[tower])
    log_param_census(params, mask)

    if args.visual_stat_flops:
        # flops-stat-and-exit smoke (reference --visual_stat_flops,
        # audio_tri_main.py:349-371 counts ptflops over model.visual)
        import json as _json

        from vitlens_tpu.utils.flops import model_flops_report

        if args.modality == "image":
            hw = cfg.vision.image_size
            shape = (3, hw, hw)
        else:
            shape = _synthetic_spec(args, cfg)["visual"][0]
        x = jnp.zeros((1,) + tuple(shape), jnp.float32)
        rep = model_flops_report(cfg, x, params, model_state,
                                 compute_dtype=_dtype(args))
        out = {"params_M": round(rep["params_total"] / 1e6, 2),
               "gflops_per_sample": round(rep.get("gflops_per_sample", -1.0),
                                          2)}
        logging.info(f"visual tower stats: {out}")
        print(_json.dumps(out))
        return 0

    proc_id, n_procs = jax.process_index(), jax.process_count()
    is_rank0 = proc_id == 0
    train_info = build_train_data(args, tokenizer, n_shards, cfg,
                                  proc_id=proc_id, n_procs=n_procs)
    if train_info is None:
        results = evaluate(args, params, model_state, cfg, tokenizer,
                           mesh=mesh)
        flat = {(os.path.basename(k) if os.path.sep in k else k):
                _primary_metric({k: v}) for k, v in results.items()}
        flat.update(_flatten_results(results))
        if is_rank0:  # one appender to the shared results.jsonl
            MetricsWriter(log_dir).log(flat, 0, "val")
        return 0

    steps_per_epoch = train_info.num_batches
    total_steps = steps_per_epoch * args.epochs
    tx, mask = make_optimizer(
        params,
        OptimizerConfig(lr=args.lr, beta1=args.beta1, beta2=args.beta2,
                        eps=args.eps, weight_decay=args.wd,
                        grad_clip_norm=args.grad_clip_norm,
                        warmup=args.warmup, total_steps=total_steps,
                        schedule=args.lr_scheduler),
        mask,
    )
    sc = StepConfig(
        n_tower=args.n_tower, align_to=args.align_to,
        # the video distill branch pairs with TriClipDistillTokenLoss
        # (reference create_loss keyed on exp_args, factory.py:750-851)
        contra_loss_type=("distill_token" if args.video_distill
                          else args.contra_loss_type),
        local_loss=args.local_loss,
        sim_thres=args.sim_thres, accum_freq=args.accum_freq,
        video_distill=args.video_distill,
        compute_dtype=_dtype(args),
        remat=(args.remat_policy if args.grad_checkpointing
               and args.remat_policy != "full" else args.grad_checkpointing),
        sync_bn=args.use_bn_sync and mesh is not None,
    )
    partition = ("fsdp" if ((args.fsdp or args.tp > 1) and mesh is not None)
                 else "ddp")
    step = make_train_step(cfg, tx, mask, sc, mesh=mesh, donate=True,
                           partition=partition)
    ts = init_train_state(params, model_state, tx)

    ckpt_dir = os.path.join(log_dir, "checkpoints")
    start_epoch = 0
    resume_sharded = None
    if args.resume:
        path = (C.get_latest_checkpoint(ckpt_dir) if args.resume == "latest"
                else args.resume)
        if path and C.load_meta(path).get("sharded"):
            # a collective checkpoint restores onto the PLACED target
            # shardings — defer until after fsdp_place/replicate below
            resume_sharded = path
        elif path:
            ts = C.load_checkpoint(path, ts, ckpt_only=args.resume_ckpt_only)
            start_epoch = C.load_meta(path).get("epoch", 0)
            logging.info(f"resumed from {path} (epoch {start_epoch})")

    if mesh is not None:
        if partition == "fsdp":
            from vitlens_tpu.parallel.fsdp import fsdp_place, fsdp_tp_place

            ts = (fsdp_tp_place(ts, mesh) if args.tp > 1
                  else fsdp_place(ts, mesh))
        else:
            ts = replicate(mesh, ts)
    if resume_sharded:
        ts = C.load_checkpoint_sharded(resume_sharded, ts,
                                       ckpt_only=args.resume_ckpt_only)
        start_epoch = C.load_meta(resume_sharded).get("epoch", 0)
        logging.info(f"resumed (sharded) from {resume_sharded} "
                     f"(epoch {start_epoch})")
    writer = MetricsWriter(log_dir, use_tensorboard="tensorboard" in args.report_to)
    meter = ThroughputMeter(n_chips=n_chips)
    saver = C.AsyncSaver()
    sync_stop = None
    if args.remote_sync and is_rank0:
        sync_stop = C.start_remote_sync(ckpt_dir, args.remote_sync,
                                        args.remote_sync_frequency)
    # host checkpoint snapshots need fully-replicated (or single-process)
    # state: a cross-process FSDP shard can't be np.asarray'd locally —
    # those runs checkpoint via the collective orbax path instead (each
    # host writes its own shards, train/checkpoint.py sharded savers)
    can_snapshot = n_procs == 1 or partition == "ddp"
    if not can_snapshot:
        logging.info("multi-host sharded state: checkpoints use the "
                     "collective orbax path (synchronous, every host "
                     "writes its shards)")

    # preemption-safe training (beyond the reference): TPU pods deliver
    # SIGTERM with a grace window before eviction; checkpoint at the next
    # step boundary and exit cleanly so --resume latest continues the run
    got_sigterm = {"flag": False}
    if args.preempt_sync_every > 0:
        import signal

        def _on_sigterm(signum, frame):
            got_sigterm["flag"] = True

        try:  # only valid in the main thread; no-op elsewhere
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass

    def _preempt_agreed() -> bool:
        if n_procs == 1:
            return got_sigterm["flag"]
        # ranks may receive SIGTERM at different times (or only some do
        # under scale-down): agree collectively so every rank enters the
        # save — or none does
        from vitlens_tpu.parallel.mesh import all_gather_object

        return any(bool(f) for f in all_gather_object(got_sigterm["flag"]))

    rng = jax.random.PRNGKey(args.seed)
    global_step = int(np.asarray(ts.step))
    trace_active = False
    preempted = False
    for epoch in range(start_epoch, args.epochs):
        train_info.set_epoch(epoch)
        if args.input_prefetch:
            # batch N+1's prep + H2D copy overlaps batch N's compute on a
            # staging thread (reference PrefetchLoader, training/data.py:42-107)
            from vitlens_tpu.data.loader import DevicePrefetcher

            batches = DevicePrefetcher(
                train_info.dataloader, mesh=mesh,
                map_fn=lambda raw: _prep_batch(raw, args, tokenizer))
        else:
            batches = (
                shard_batch(mesh, _prep_batch(raw, args, tokenizer))
                if mesh is not None else _prep_batch(raw, args, tokenizer)
                for raw in train_info.dataloader)
        for batch in batches:
            rng, sub = jax.random.split(rng)
            if args.profile_steps and global_step == 2:
                # steady state: step 0 compiles, step 1 warms caches
                jax.profiler.start_trace(os.path.join(log_dir, "trace"))
                trace_active = True
            ts, metrics = step(ts, batch, sub)
            global_step += 1
            if trace_active and global_step >= 2 + args.profile_steps:
                jax.tree.map(np.asarray, metrics)  # fence before stopping
                jax.profiler.stop_trace()
                trace_active = False
                logging.info(f"profiler trace written to "
                             f"{os.path.join(log_dir, 'trace')}")
            if global_step % args.log_every_n_steps == 0:
                sps, spsc = meter.tick_step(
                    args.batch_size * n_shards * args.log_every_n_steps)
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                m.update({"samples_per_s": sps, "samples_per_s_chip": spsc,
                          "epoch": epoch})
                if is_rank0:
                    writer.log(m, global_step, "train")
                    logging.info(
                        f"epoch {epoch} step {global_step}: "
                        + ", ".join(f"{k}={v:.4f}" for k, v in m.items()))
            # single-process: the flag check is free, test every step;
            # multi-host: the agreement is 2 host-blocking allgathers, so
            # only every preempt_sync_every steps
            if (args.preempt_sync_every > 0
                    and (n_procs == 1
                         or global_step % args.preempt_sync_every == 0)
                    and _preempt_agreed()):
                logging.info(f"SIGTERM: checkpointing at step {global_step} "
                             f"(epoch {epoch} incomplete) and exiting")
                tag = f"preempt_step_{global_step}"
                extra = {"preempt_step": global_step}
                # meta epoch = completed epochs -> resume restarts this one
                if not can_snapshot:
                    C.save_checkpoint_sharded(ckpt_dir, ts, epoch,
                                              is_latest=True, extra=extra,
                                              tag=tag)
                elif is_rank0:
                    # through the saver queue: an epoch-end save may be
                    # in flight on the worker, and two concurrent writers
                    # race on the epoch_latest tmp+rename dance
                    host = jax.tree.map(np.asarray, ts)
                    saver.submit(lambda s=host, e=epoch:
                                 C.save_checkpoint(ckpt_dir, s, e,
                                                   is_latest=True,
                                                   extra=extra, tag=tag))
                preempted = True
                break
        if preempted:
            break
        # end epoch: eval + ckpt (host snapshot is synchronous — it decouples
        # from donated device buffers — the disk write happens on the saver
        # worker so the next epoch starts immediately)
        # only rank 0 consumes the snapshot (save_best/save_checkpoint are
        # both rank-0-gated below): skip the multi-GB device->host fetch on
        # worker ranks
        host_ts = (jax.tree.map(np.asarray, ts)
                   if can_snapshot and is_rank0 else None)
        if args.val_data and (epoch + 1) % args.val_frequency == 0:
            # device-resident train params go straight into the eval jits
            # (no host round-trip); under a mesh the encode batches shard
            # over the data axis so all chips participate
            results = evaluate(args, ts.params, ts.model_state, cfg,
                               tokenizer, mesh=mesh)
            metric = _primary_metric(results)
            if is_rank0:
                writer.log({"primary": metric, **_flatten_results(results)},
                           global_step, "val")
                if host_ts is not None:
                    saver.submit(lambda s=host_ts, e=epoch + 1, m=metric:
                                 C.save_best(ckpt_dir, s, e, m))
            if not can_snapshot:  # COLLECTIVE: every rank participates
                C.save_best_sharded(ckpt_dir, ts, epoch + 1, metric)
        if (epoch + 1) % args.save_frequency == 0 or args.save_most_recent:
            if is_rank0 and host_ts is not None:
                saver.submit(lambda s=host_ts, e=epoch + 1:
                             C.save_checkpoint(ckpt_dir, s, e,
                                               is_latest=args.save_most_recent))
            elif not can_snapshot:  # COLLECTIVE sharded save (synchronous)
                C.save_checkpoint_sharded(ckpt_dir, ts, epoch + 1,
                                          is_latest=args.save_most_recent)
    if trace_active:  # --profile-steps exceeded the run length
        jax.profiler.stop_trace()
    saver.close()  # drain pending writes; re-raises a failed save
    if sync_stop is not None:
        sync_stop.set()
    return 0


if __name__ == "__main__":
    sys.exit(main())
