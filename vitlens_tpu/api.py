"""One-stop inference API.

`ViTLens` mirrors the reference mm_vit_lens.ViTLens
(/root/reference/vitlens/src/mm_vit_lens/vitlens.py:21-189): load one tower
per requested modality, `encode({modality: inputs}, normalize=True)` ->
{modality: embeddings}; audio inputs are [B, n_clip, T, F] and clip
embeddings are mean-pooled before normalization (vitlens.py:175-183).

TPU design: towers share the frozen trunk weights where modalities use the
same ViT; each modality's encode is a cached jit function; inputs are
processed host-side by vitlens_tpu.data.processors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vitlens_tpu.config import make_model_config, image_tower_config
from vitlens_tpu.data.processors import default_processors
from vitlens_tpu.models.text import text_tower_apply
from vitlens_tpu.models.vit import vision_tower_apply

VISUAL_MODALITIES = ("pc", "audio", "depth", "tactile", "eeg", "video")


def _l2n(x):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


class ViTLens:
    """Multi-modal encoder bound to one trunk (default ViT-L-14).

    checkpoints: optional {modality: path-to-torch-ckpt} supplying the
    released per-modality weights (vitlensL_{pc,audio,...}.pt) and/or a
    single merged checkpoint under key "all".
    """

    def __init__(
        self,
        model_var: str = "vitlensL",
        modality_loaded: Sequence[str] = ("image", "text"),
        checkpoints: Optional[Dict[str, str]] = None,
        compute_dtype=jnp.float32,
        seed: int = 0,
        batch_buckets: Optional[Sequence[int]] = None,
        mesh=None,
        param_dtype=None,
    ):
        """batch_buckets: serving aid — pad each encode batch up to the
        next bucket size so XLA compiles once per bucket instead of once
        per distinct batch size (padded rows are zero inputs, computed
        row-independently and sliced off; embeddings are exact). E.g.
        `batch_buckets=(1, 8, 32)`. None = exact shapes (default).

        mesh: optional `jax.sharding.Mesh` with a `data` axis (see
        `parallel.mesh.make_mesh`). Weights replicate onto the mesh and
        every encode batch shards over `data`, so serving throughput
        scales with chips at the per-chip-optimal batch (B64 is the
        measured per-chip optimum — scale chips, not batch; CLAUDE.md).
        Rows pad to a multiple of the data axis and are sliced off;
        embeddings are exact. The reference serves single-GPU only.

        param_dtype: optionally cast float32 weights at load time (e.g.
        jnp.bfloat16 halves HBM — the vitlensG 2.5 B-param trunk is ~5 GB
        bf16 vs ~10 GB fp32 and serves single-chip on v5e)."""
        trunk = {"vitlensL": "ViT-L-14", "vitlensB": "ViT-B-16",
                 "vitlensG": "ViT-bigG-14"}[model_var]
        self.model_var = model_var
        self.trunk = trunk
        self.mesh = mesh
        if mesh is not None:
            from vitlens_tpu.parallel.mesh import data_sharding

            self._dsh = data_sharding(mesh)
            self._ndata = mesh.shape["data"]
        self.batch_buckets = (tuple(sorted(batch_buckets))
                              if batch_buckets else None)
        self.compute_dtype = compute_dtype
        self.param_dtype = param_dtype
        self.modalities = list(modality_loaded)
        self.processors = default_processors(self.modalities)
        self._towers: Dict[str, Any] = {}
        self._jit_cache: Dict[str, Any] = {}
        checkpoints = checkpoints or {}

        key = jax.random.PRNGKey(seed)
        for m in self.modalities:
            key, sub = jax.random.split(key)
            self._init_modality(m, sub, checkpoints.get(m) or checkpoints.get("all"))

        # the pc processor must match the loaded tower's geometry: point
        # count AND channel width (vitlensG ingests xyz+rgb, in_channel 6;
        # 3-channel inputs get the OpenShape 0.4-gray rgb fill)
        if "pc" in self._towers and self._towers["pc"]["kind"] == "visual":
            pt = self._towers["pc"]["tower_cfg"].point
            if pt is not None:
                self.processors["pc"].n = pt.npoints
                self.processors["pc"].channels = pt.in_channel

    # -- construction ------------------------------------------------------

    def _init_modality(self, m: str, key, ckpt_path: Optional[str]):
        """Reference _init_modality_module (vitlens.py:37-107): image -> image
        tower, text -> text tower, else -> Lens visual tower."""
        cfg = make_model_config(self.trunk, m if m in VISUAL_MODALITIES else "image")
        if self.model_var == "vitlensG" and m == "pc":
            # the published vitlensG pc recipe (OpenShape-Triplets): PNSA
            # tokenizer, 10k xyz+rgb points, skip-first-16 bigG trunk
            # (train/openshape.py:43-64, TRAIN_INFERENCE.md)
            from vitlens_tpu.config import replace as _cfg_replace
            from vitlens_tpu.train.openshape import vitlensG_tower_config

            cfg = _cfg_replace(cfg, tower=vitlensG_tower_config())
        # init host-side: random init runs on the CPU backend (threefry is
        # backend-deterministic, so values are identical), keeping the chip
        # free of the fp32 init copy — the vitlensG trunk is ~10 GB fp32 and
        # only its bf16 cast should ever reach HBM. _place_tower moves the
        # final (possibly ckpt-loaded, possibly cast) weights to the device.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            if m == "text":
                from vitlens_tpu.models.text import text_tower_init

                params = text_tower_init(key, cfg.text, cfg.embed_dim)
                entry = {"cfg": cfg, "params": params, "state": None,
                         "kind": "text"}
            elif m == "image":
                from vitlens_tpu.models.vit import vision_tower_init

                tcfg = image_tower_config(cfg)
                params, state = vision_tower_init(key, tcfg)
                entry = {"cfg": cfg, "tower_cfg": tcfg, "params": params,
                         "state": state, "kind": "image"}
            else:
                from vitlens_tpu.models.vit import vision_tower_init

                params, state = vision_tower_init(key, cfg.tower)
                entry = {"cfg": cfg, "tower_cfg": cfg.tower, "params": params,
                         "state": state, "kind": "visual"}

        if ckpt_path:
            self._load_ckpt(entry, m, ckpt_path)
        if self.param_dtype is not None:
            def _cast(l):
                a = np.asarray(l)
                return (a.astype(self.param_dtype)
                        if a.dtype == np.float32 else a)

            entry["params"] = jax.tree.map(_cast, entry["params"])
        self._place_tower(entry)
        self._towers[m] = entry

    def _place_tower(self, entry) -> None:
        """Move a tower's weights to the serving device(s): replicate onto
        the mesh, or device_put to the default device single-chip (init is
        host-side — without this, every encode would re-upload the params).
        One H2D per tower at load time, none per request.

        The target device must be EXPLICIT: init ran under
        `jax.default_device(cpu)`, so uncast params are jax arrays
        *committed* to the CPU device, and `device_put(x, device=None)` is
        an identity for committed arrays — they would silently stay on
        host and every encode would re-upload ~1.2 GB fp32 ViT-L weights
        (measured 36 s/dispatch through the tunnel vs 0.9 s placed)."""
        if self.mesh is None:
            dev = jax.config.jax_default_device or jax.devices()[0]
            entry["params"] = jax.device_put(entry["params"], dev)
            if entry["state"] is not None:
                entry["state"] = jax.device_put(entry["state"], dev)
            return
        from vitlens_tpu.parallel.mesh import replicate

        entry["params"] = replicate(self.mesh, entry["params"])
        if entry["state"] is not None:
            entry["state"] = replicate(self.mesh, entry["state"])

    def _shard_rows(self, x: jnp.ndarray):
        """Pad the leading (row) dim to a multiple of the mesh data axis
        and shard; returns (sharded_x, real_rows). Identity without a
        mesh."""
        r = x.shape[0]
        if self.mesh is None:
            return x, r
        pad = (-r) % self._ndata
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return jax.device_put(x, self._dsh), r

    def _load_ckpt(self, entry, m: str, path: str):
        from vitlens_tpu.weights.torch_convert import (
            convert_text_tower, convert_vision_tower, load_torch_checkpoint,
            strip_prefixes, sub,
        )

        sd = strip_prefixes(load_torch_checkpoint(path))
        # merged multi-modality checkpoint (reference export_checkpoint,
        # vitlens.py:153-159): keys are vitlens.{modality}.{...}
        if any(k.startswith(f"vitlens.{m}.") for k in sd):
            sd = sub(sd, f"vitlens.{m}.")
        cfg = entry["cfg"]
        if entry["kind"] == "text":
            if "token_embedding.weight" in sd:
                entry["params"] = convert_text_tower(sd, cfg.text.layers)
            elif any(k.startswith("text.") for k in sd):
                entry["params"] = convert_text_tower(sub(sd, "text."), cfg.text.layers)
            else:
                # LOUD: returning here would silently serve random-init
                # text weights (normalized embeddings that look plausible)
                sample = sorted(sd)[:5]
                raise ValueError(
                    f"checkpoint {path!r} matches no known text-tower "
                    f"layout (no 'token_embedding.weight', no 'text.' "
                    f"prefix); first keys: {sample}")
        else:
            prefix = "image." if (entry["kind"] == "image" and
                                  any(k.startswith("image.") for k in sd)) else "visual."
            tower_sd = sub(sd, prefix) if any(
                k.startswith(prefix) for k in sd) else sd
            entry["params"], entry["state"] = convert_vision_tower(
                tower_sd, entry["tower_cfg"]
            )

    # -- encoding ----------------------------------------------------------

    def _encode_fn(self, m: str):
        if m in self._jit_cache:
            return self._jit_cache[m]
        entry = self._towers[m]
        cfg = entry["cfg"]
        dt = self.compute_dtype

        if entry["kind"] == "text":
            def fn(params, x):
                return text_tower_apply(params, x, cfg.text,
                                        quick_gelu=cfg.quick_gelu,
                                        compute_dtype=dt)

            specs = (P(), P("data"))
        else:
            tcfg = entry["tower_cfg"]

            def fn(params, state, x):
                feats, _ = vision_tower_apply(params, state, x, tcfg,
                                              compute_dtype=dt)
                return feats

            specs = (P(), P(), P("data"))

        if self.mesh is not None:
            # shard_map, not GSPMD jit: encode is row-independent, so the
            # batch shards manually over `data` with weights replicated.
            # This keeps the Pallas kernels (fused MLP, FPS, fused point
            # encoder) valid per-shard — tpu_custom_call has no GSPMD
            # partitioning rules, so a sharded plain jit could not split it.
            fn = shard_map(fn, mesh=self.mesh, in_specs=specs,
                           out_specs=P("data"))
        fn = jax.jit(fn)

        self._jit_cache[m] = fn
        return fn

    def encode(self, inputs: Dict[str, Any], normalize: bool = True,
               preprocessed: bool = False) -> Dict[str, jnp.ndarray]:
        """inputs: {modality: list of file paths / raw strings (text) /
        arrays}. Returns {modality: [B, embed_dim]}."""
        out: Dict[str, jnp.ndarray] = {}
        for m, data in inputs.items():
            if m not in self._towers:
                raise KeyError(f"modality {m!r} not loaded; have {self.modalities}")
            x = data if preprocessed else self.processors[m](data)
            x = jnp.asarray(np.asarray(x))
            B = x.shape[0]
            x = self._pad_to_bucket(x)
            entry = self._towers[m]
            fn = self._encode_fn(m)
            if entry["kind"] == "text":
                xr, r = self._shard_rows(x)
                feats = fn(entry["params"], xr)[:r]
            elif m == "audio" and x.ndim == 4:
                Bp, S = x.shape[:2]
                xr, r = self._shard_rows(
                    x.reshape((Bp * S,) + x.shape[2:]))
                feats = fn(entry["params"], entry["state"], xr)[:r]
                feats = feats.reshape(Bp, S, -1).mean(axis=1)  # clip mean
            else:
                xr, r = self._shard_rows(x)
                feats = fn(entry["params"], entry["state"], xr)[:r]
            feats = feats[:B]
            out[m] = _l2n(feats) if normalize else feats
        return out

    def _pad_to_bucket(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad the batch dim up to the next configured bucket (every
        tower computes rows independently in eval mode, so the padded rows
        cannot perturb the real ones)."""
        if self.batch_buckets is None:
            return x
        B = x.shape[0]
        bucket = next((b for b in self.batch_buckets if b >= B), B)
        if bucket == B:
            return x
        pad = jnp.zeros((bucket - B,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    # -- warmup (serving cold-start) ----------------------------------------

    def _warmup_sample(self, m: str, b: int, n_clips: int = 3) -> np.ndarray:
        """Zero input of the processor-OUTPUT shape for one modality (the
        same per-modality geometry as the train driver's synthetic spec)."""
        entry = self._towers[m]
        if entry["kind"] == "text":
            return np.zeros((b, entry["cfg"].text.context_length), np.int32)
        t = entry["tower_cfg"]
        hw = t.arch.image_size
        shapes = {
            "image": (3, hw, hw),
            "tactile": (3, hw, hw),
            "depth": (1, hw, hw),
            "pc": (t.point.npoints, t.point.in_channel) if t.point else None,
            "audio": ((n_clips, t.audio.target_length, t.audio.mel_bins)
                      if t.audio else None),
            "eeg": (t.eeg.chans, t.eeg.time_len) if t.eeg else None,
            "video": ((t.video.n_frames, 3, hw, hw) if t.video else None),
        }
        shape = shapes.get(t.modality if entry["kind"] == "visual" else m)
        if shape is None:
            raise ValueError(f"no warmup shape for modality {m!r}")
        return np.zeros((b,) + shape, np.float32)

    def warmup(self, batch_sizes=None, log=None) -> None:
        """Pre-compile every (modality, batch-bucket) encode shape with zero
        inputs so the first real request never pays the XLA compile —
        cold-start compiles run minutes for big trunks and would otherwise
        burn request timeouts (serve.py)."""
        sizes = list(batch_sizes if batch_sizes is not None
                     else (self.batch_buckets or [1]))
        for m in self.modalities:
            for b in sizes:
                x = self._warmup_sample(m, b)
                feats = self.encode({m: x}, normalize=True, preprocessed=True)
                np.asarray(feats[m])  # fence the compile + execute
                if log:
                    log(f"warmup {m} b{b} done")

    # -- checkpoint export (reference vitlens.py:153-159) ------------------

    def export_params(self, merge_lora: bool = True) -> Dict[str, Any]:
        """merge_lora=True (default) folds any LoRA factors carried by a
        fine-tuned tower back into plain weights (train/lora.py), so the
        export has the exact layout converters/checkpoints expect."""
        out = {}
        for m in self.modalities:
            p = self._towers[m]["params"]
            if merge_lora and isinstance(p, dict) and "lora" in p:
                from vitlens_tpu.train.lora import merge_lora as _merge

                p = _merge(p)
            out[m] = p
        return out

    def _ckpt_tree(self, merge_lora: bool = False):
        # exports save merged (no "lora" subtree) and loads target the same
        # merged layout; load_checkpoint re-attaches live LoRA factors after
        return {
            "params": self.export_params(merge_lora=merge_lora),
            "state": {m: self._towers[m]["state"] for m in self.modalities
                      if self._towers[m]["state"] is not None},
        }

    def export_checkpoint(self, save_path: str) -> str:
        """Save a merged multi-modality checkpoint (params + BN state),
        loadable with `ViTLens.load_checkpoint`."""
        import json
        import os

        from vitlens_tpu.train import checkpoint as C

        C._save_tree(save_path, self._ckpt_tree(merge_lora=True))
        with open(os.path.join(save_path, "vitlens_meta.json"), "w") as f:
            json.dump({"model_var": self.model_var,
                       "modalities": list(self.modalities)}, f)
        return save_path

    def load_checkpoint(self, path: str) -> None:
        """Restore a merged checkpoint written by export_checkpoint.

        Exports carry MERGED weights (no "lora" subtree): a tower whose
        live params carry LoRA factors restores the merged base weights
        and re-attaches its factors with `b` zeroed (delta == 0), so the
        restored model equals the export exactly and can continue
        fine-tuning from it."""
        from vitlens_tpu.train import checkpoint as C

        restored = C._load_tree(path, self._ckpt_tree(merge_lora=True))
        for m in self.modalities:
            live = self._towers[m]["params"]
            new_p = restored["params"][m]
            if isinstance(live, dict) and "lora" in live:
                from vitlens_tpu.train.lora import reset_lora

                new_p = dict(new_p)
                new_p["lora"] = reset_lora(live["lora"])
            self._towers[m]["params"] = new_p
            if m in restored.get("state", {}):
                self._towers[m]["state"] = restored["state"][m]
            self._place_tower(self._towers[m])
