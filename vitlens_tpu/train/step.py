"""Training step: optimizer, sharded tri/dual contrastive step, accum-freq
cached-negative replay.

Re-design of the reference training loops (training/train.py:74-560) for the
TPU execution model:
  * pure DP over a `data` mesh axis via shard_map (the DDP equivalent);
    params replicated, batch sharded, gradient pmean = DDP all-reduce,
    embedding all_gather inside the loss = the reference's gather_features.
  * AdamW with the reference's weight-decay exclusion (ndim<2 / bn / ln /
    bias / logit_scale — audio_main.py:368-393) expressed as a name mask.
  * freeze masks multiply optimizer updates (train only what the recipe
    unlocks — see freeze.py).
  * logit_scale clamped to [0, ln 100] post-update (train.py:248-249).
  * --accum-freq>1: micro-batch feature cache with stop-gradient negatives
    replay (train.py:154-210) via a scan-free static unroll.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitlens_tpu.config import ModelConfig
from vitlens_tpu.models import tri
from vitlens_tpu.train import losses as losses_lib
from vitlens_tpu.train.freeze import apply_mask, ones_like_mask
from vitlens_tpu.train.schedules import get_schedule

Params = Dict[str, Any]

MAX_LOGIT_SCALE = math.log(100.0)

_NO_DECAY_LEAF_NAMES = {
    "b", "bias", "scale", "qkv_b", "out_b", "gamma",
    "class_embedding", "logit_scale",
}


def wd_mask(params: Params) -> Params:
    """True where weight decay applies. Mirrors the reference exclusion
    (torch ndim<2 or name contains bn/ln/bias or logit_scale): our biases and
    LN/BN scale+bias leaves are exactly the _NO_DECAY_LEAF_NAMES."""

    def decide(path, leaf):
        last = path[-1]
        name = last.key if hasattr(last, "key") else str(last)
        return name not in _NO_DECAY_LEAF_NAMES

    return jax.tree_util.tree_map_with_path(decide, params)


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-4
    beta1: float = 0.9
    beta2: float = 0.98  # reference default for ViT runs (params.py)
    eps: float = 1e-6
    weight_decay: float = 0.2
    grad_clip_norm: Optional[float] = None
    warmup: int = 10000
    total_steps: int = 100000
    schedule: str = "cosine"


def leaf_trainable(trainable_mask: Params) -> Params:
    """Per-leaf bool: True iff ANY element of the leaf trains. Leaves that
    are entirely frozen get NO optimizer state (optax.masked) — for the
    published recipes (frozen image+text towers) this saves ~3.4 GB of Adam
    moments on ViT-L."""
    return jax.tree.map(lambda m: bool(jnp.any(m > 0)), trainable_mask)


def make_optimizer(
    params: Params,
    cfg: OptimizerConfig,
    trainable_mask: Optional[Params] = None,
) -> Tuple[optax.GradientTransformation, Params]:
    sched = get_schedule(cfg.schedule, cfg.lr, cfg.warmup, cfg.total_steps)
    if trainable_mask is None:
        trainable_mask = ones_like_mask(params)
    chain = []
    if cfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=sched,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=wd_mask(params),
        )
    )
    tx = optax.masked(optax.chain(*chain), leaf_trainable(trainable_mask))
    return tx, trainable_mask


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Params
    model_state: Params  # BN running stats etc.
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, model_state, tx) -> TrainState:
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def clamp_logit_scale(params: Params) -> Params:
    out = dict(params)
    out["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, MAX_LOGIT_SCALE)
    return out


# ---------------------------------------------------------------------------
# Tri / dual step factories
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StepConfig:
    n_tower: int = 3                  # 3 = tri loss, 2 = dual (align_to)
    align_to: str = "image"           # dual anchor: image | text; or "clip"
    # align_to="clip" with n_tower=2 trains the classic two-tower CLIP
    # objective (image <-> text; reference train_one_epoch, train.py:563-763)
    contra_loss_type: str = "general"  # general | label_mask | sim_mask
    local_loss: bool = True
    sim_thres: float = 0.9
    accum_freq: int = 1
    compute_dtype: Any = jnp.bfloat16
    remat: Any = False  # False | True (full) | "dots" (save matmul outputs)
    sync_bn: bool = True
    # video distill-tokens branch (reference vid_distill_tokens,
    # model.py:545-585): anchor = frame-mean image tower over the video,
    # plus token-level distillation into the video Lens tower
    video_distill: bool = False

    def __post_init__(self):
        # the distill-token objective consumes visual_tokens/image_tokens,
        # which ONLY the video-distill forward emits (tri.py
        # tri_forward_video_distill) — the plain n_tower=3 forward returns
        # features only, so the loss would KeyError mid-trace. Fail at
        # construction instead; matches the reference, where create_loss
        # keys TriClipDistillTokenLoss solely on vid_distill_tokens
        # (factory.py:750-851)
        if self.contra_loss_type == "distill_token" and not self.video_distill:
            raise ValueError(
                "contra_loss_type='distill_token' needs the video-distill "
                "forward (it is the only one emitting visual_tokens/"
                "image_tokens): set video_distill=True "
                f"(got n_tower={self.n_tower}, video_distill=False)")


def _forward_features(
    params, model_state, batch, model_cfg: ModelConfig, sc: StepConfig,
    axis_name: Optional[str], train: bool, fps_key=None,
):
    """Encode whichever towers the step needs. Returns (out dict, new_state)."""
    out: Dict[str, jnp.ndarray] = {
        "logit_scale": jnp.exp(params["logit_scale"]).astype(jnp.float32)
    }
    new_state = model_state
    dt = sc.compute_dtype
    if sc.video_distill:
        out2, new_state = tri.tri_forward_video_distill(
            params, model_state, model_cfg, video_frames=batch["image"],
            text=batch["text"], visual_x=batch["visual"], train=train,
            compute_dtype=dt, remat=sc.remat,
        )
        out.update(out2)
        return out, new_state
    if sc.n_tower == 2 and sc.align_to == "clip":
        # classic CLIP: image <-> text, no Lens tower involved
        out["anchor_features"] = tri.encode_image(
            params, model_state, batch["image"], model_cfg,
            normalize=True, compute_dtype=dt, remat=sc.remat,
        )
        out["visual_features"] = tri.encode_text(
            params, batch["text"], model_cfg,
            normalize=True, compute_dtype=dt, remat=sc.remat,
        )
        return out, new_state
    if sc.n_tower == 3:
        out["image_features"] = tri.encode_image(
            params, model_state, batch["image"], model_cfg,
            normalize=True, compute_dtype=dt, remat=sc.remat,
        )
        out["text_features"] = tri.encode_text(
            params, batch["text"], model_cfg,
            normalize=True, compute_dtype=dt, remat=sc.remat,
        )
    else:
        if sc.align_to in ("image", "video"):
            out["anchor_features"] = tri.encode_image(
                params, model_state, batch["image"], model_cfg,
                normalize=True, compute_dtype=dt, remat=sc.remat,
            )
        else:
            out["anchor_features"] = tri.encode_text(
                params, batch["text"], model_cfg,
                normalize=True, compute_dtype=dt, remat=sc.remat,
            )
    out["visual_features"], new_state = tri.encode_visual(
        params, model_state, batch["visual"], model_cfg,
        normalize=True, train=train, compute_dtype=dt, remat=sc.remat,
        fps_key=fps_key,
        bn_axis_name=axis_name if (sc.sync_bn and train) else None,
    )
    return out, new_state


def _loss_from_features(out, batch, sc: StepConfig, axis_name):
    labels = batch.get("label")
    loss_fn = losses_lib.make_loss_fn(
        sc.n_tower, sc.contra_loss_type,
        axis_name=axis_name, local_loss=sc.local_loss, sim_thres=sc.sim_thres,
    )
    return loss_fn(out, labels)


def make_train_step(
    model_cfg: ModelConfig,
    tx: optax.GradientTransformation,
    trainable_mask: Params,
    sc: StepConfig = StepConfig(),
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    donate: bool = False,
    partition: str = "ddp",
):
    """Build the jitted sharded train step.

    With a mesh, `partition` picks the parallelism style:
      * "ddp" (default): shard_map — params/opt replicated, batch sharded on
        `data`; grads pmean'd (DDP semantics, matching the reference's
        torch DDP); loss gathers embeddings over the axis.
      * "fsdp": GSPMD — params/opt/model_state stored SHARDED over `data`
        (parallel/fsdp.py rule), batch sharded on `data`; XLA inserts the
        all-gathers/reduce-scatters over ICI (ZeRO-3 semantics). The step is
        written as a global-batch computation (no axis_name): the
        contrastive loss is the global one and BN stats are global-batch
        stats, both numerically equal to the ddp path's gathered-local-loss
        + sync-BN pmean (tests/test_fsdp.py). The caller places the
        TrainState with `parallel.fsdp.fsdp_place` first.
    Without a mesh: single-device step.

    donate=True donates the TrainState buffers (params + optimizer state are
    updated in place on device — halves their HBM footprint); the caller must
    not touch the previous TrainState afterwards.
    """

    # Fully-frozen towers get stop_gradient'd params so XLA prunes their
    # entire backward pass (forward-only frozen CLIP towers — the published
    # recipes freeze image+text). Partial unfreezing keeps the backward.
    frozen_towers = [
        k for k in ("image", "text", "visual")
        if k in trainable_mask and not any(
            bool(jnp.any(m > 0)) for m in jax.tree.leaves(trainable_mask[k]))
    ]

    def _stopped(p):
        out = dict(p)
        for k in frozen_towers:
            out[k] = jax.lax.stop_gradient(p[k])
        return out

    # Differentiate ONLY trainable leaves: value_and_grad over the trainable
    # subset avoids allocating zero gradients (and backward residuals) for
    # frozen towers — ~3 GB on a frozen-trunk ViT-L recipe.
    _flat_trainable = [
        bool(jnp.any(m > 0)) for m in jax.tree.leaves(trainable_mask)
    ]

    def _split_trainable(params):
        leaves, treedef = jax.tree.flatten(params)
        train = [l for l, t in zip(leaves, _flat_trainable) if t]
        frozen = [l for l, t in zip(leaves, _flat_trainable) if not t]
        return train, frozen, treedef

    def _merge_trainable(train, frozen, treedef):
        it_t, it_f = iter(train), iter(frozen)
        leaves = [next(it_t) if t else next(it_f) for t in _flat_trainable]
        return jax.tree.unflatten(treedef, leaves)

    def _grads_to_tree(train_grads, params):
        leaves, treedef = jax.tree.flatten(params)
        it = iter(train_grads)
        out = [next(it) if t else jnp.zeros((), l.dtype)
               for l, t in zip(leaves, _flat_trainable)]
        # frozen grads as scalar zeros: broadcast-compatible with the
        # update mask multiply and never materialised at full size
        return jax.tree.unflatten(treedef, out)

    def micro_grads(params, model_state, batch, fps_key, ax):
        train, frozen, treedef = _split_trainable(params)

        def loss_of(train_leaves):
            p = _merge_trainable(train_leaves, frozen, treedef)
            out, new_state = _forward_features(
                _stopped(p), model_state, batch, model_cfg, sc, ax, True,
                fps_key
            )
            loss = _loss_from_features(out, batch, sc, ax)
            return loss, new_state

        (loss, new_state), tg = jax.value_and_grad(loss_of, has_aux=True)(train)
        return loss, _grads_to_tree(tg, params), new_state

    def accum_grads(params, model_state, batch, fps_key, ax):
        """--accum-freq replay (train.py:154-210): cache no-grad features for
        all micro-batches, then per micro-batch recompute with grads and
        splice the cached features of the others as negatives."""
        A = sc.accum_freq
        b_local = jax.tree.leaves(batch)[0].shape[0]
        if b_local % A != 0:
            raise ValueError(
                f"per-shard batch {b_local} is not divisible by "
                f"accum_freq {A} (pick A dividing batch_size/n_data)")

        def split(x):
            return x.reshape((A, x.shape[0] // A) + x.shape[1:])

        mb = jax.tree.map(split, batch)
        # pass 1: cached features, no grad
        cached = []
        st = model_state
        for i in range(A):
            bi = jax.tree.map(lambda x: x[i], mb)
            out, st = _forward_features(params, st, bi, model_cfg, sc, ax, True,
                                        None if fps_key is None else
                                        jax.random.fold_in(fps_key, i))
            cached.append({k: jax.lax.stop_gradient(v) for k, v in out.items()})

        # _tokens too: the distill_token loss consumes per-sample token
        # grids (losses.py make_loss_fn); it decomposes per sample, so
        # splicing stop_gradient'd other-micro-batch tokens is exact
        merge_keys = [k for k in cached[0]
                      if k.endswith("_features") or k.endswith("_tokens")]
        loss_total = 0.0
        # differentiate the TRAINABLE subset only, like micro_grads —
        # full-tree value_and_grad would materialise zero grads for the
        # frozen towers (~GBs) on exactly the memory-constrained runs
        # accum_freq exists for
        train0, frozen0, treedef0 = _split_trainable(params)
        tg_total = [jnp.zeros_like(l) for l in train0]
        for i in range(A):
            bi = jax.tree.map(lambda x: x[i], mb)

            def loss_of(train_leaves):
                p = _merge_trainable(train_leaves, frozen0, treedef0)
                out_i, _ = _forward_features(
                    _stopped(p), model_state, bi, model_cfg, sc, ax, True,
                    None if fps_key is None else jax.random.fold_in(fps_key, i))
                merged = {"logit_scale": out_i["logit_scale"]}
                for k in merge_keys:
                    rows = [cached[j][k] if j != i else out_i[k] for j in range(A)]
                    merged[k] = jnp.concatenate(rows, axis=0)
                return _loss_from_features(merged, batch, sc, ax)

            li, tg = jax.value_and_grad(loss_of)(train0)
            loss_total = loss_total + li
            tg_total = [a + g for a, g in zip(tg_total, tg)]
        grads_total = _grads_to_tree(tg_total, params)
        # NO 1/accum scaling: each micro pass differentiates only its own
        # micro-batch inside the full-batch loss, so the SUM of pass grads is
        # exactly the full-batch gradient (reference train.py:176-210 calls
        # backward per pass and steps once, unscaled). Loss is averaged for
        # logging only.
        return loss_total / A, grads_total, st

    def step_fn(state: TrainState, batch, fps_key=None):
        # fsdp runs the step as a global-batch computation: XLA partitions
        # it from the data shardings alone, no collective calls in the code
        ax = axis_name if (mesh is not None and partition == "ddp") else None
        if ax is not None and fps_key is not None:
            # decorrelate stochastic sampling across shards (the reference
            # seeds each rank with seed + rank, audio_main.py:52-55)
            fps_key = jax.random.fold_in(fps_key, jax.lax.axis_index(ax))
        if sc.accum_freq > 1:
            loss, grads, new_model_state = accum_grads(
                state.params, state.model_state, batch, fps_key, ax
            )
        else:
            loss, grads, new_model_state = micro_grads(
                state.params, state.model_state, batch, fps_key, ax
            )
        if ax is not None:
            grads = jax.lax.pmean(grads, ax)  # DDP grad all-reduce
            loss = jax.lax.pmean(loss, ax)
        grads = apply_mask(grads, trainable_mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = apply_mask(updates, trainable_mask)
        new_params = optax.apply_updates(state.params, updates)
        new_params = clamp_logit_scale(new_params)
        new_state = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "logit_scale": jnp.exp(new_params["logit_scale"]),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)

    if partition == "fsdp":
        from vitlens_tpu.parallel.fsdp import shardings_of

        jitted = None

        def fsdp_call(state: TrainState, batch, fps_key=None):
            # Pin in/out shardings from the placed state on first call so
            # params/opt stay FSDP-sharded step over step (XLA would
            # otherwise be free to re-layout outputs).
            nonlocal jitted
            if jitted is None:
                state_sh = shardings_of(state)
                batch_sh = jax.tree.map(
                    lambda _: NamedSharding(mesh, P(axis_name)), batch)
                repl_sh = NamedSharding(mesh, P())
                metrics_sh = {"loss": repl_sh, "logit_scale": repl_sh,
                              "grad_norm": repl_sh}
                key_sh = None if fps_key is None else repl_sh
                jitted = jax.jit(
                    step_fn,
                    in_shardings=(state_sh, batch_sh, key_sh),
                    out_shardings=(state_sh, metrics_sh),
                    **donate_kw,
                )
            return jitted(state, batch, fps_key)

        return fsdp_call
    if partition != "ddp":
        raise ValueError(f"unknown partition style: {partition!r}")

    repl = P()

    def sharded(state, batch, fps_key):
        # out_specs P() claims a replicated TrainState; with sync_bn=False
        # on a BN-bearing tower the per-device BN running stats diverge
        # (exactly torch DDP-without-SyncBN semantics) and check_vma=False
        # suppresses the replication check on purpose: host fetches read
        # shard 0 (= the reference's rank-0 checkpoint), and each device
        # keeps evolving its OWN stats across steps. Everything else
        # (params, opt state) is genuinely replicated via the psum'd grads.
        return shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(repl, P(axis_name), repl),
            out_specs=(repl, repl),
            check_vma=False,
        )(state, batch, fps_key)

    return jax.jit(sharded, **donate_kw)
