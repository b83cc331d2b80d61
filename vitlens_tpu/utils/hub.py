"""Checkpoint publishing / fetching utilities.

Mirrors the reference hub surface (open_clip/push_to_hf_hub.py, 299 LoC;
pretrained.py:440-565 download): publish a params pytree + config to the
HuggingFace hub, and resolve pretrained tags to local files. Network access
is environment-dependent (this build environment is zero-egress), so every
networked call is gated with a clear error; local cache paths always work.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

# Pretrained tag registry (reference pretrained.py:24-398). Stored as
# (hf repo, filename) or url; resolution order: local cache dir, then hub.
PRETRAINED_REGISTRY: Dict[str, Dict[str, Any]] = {
    "ViT-L-14/datacomp_xl_s13b_b90k": dict(
        hf_hub="laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K/",
        quick_gelu=False),
    "ViT-L-14/openai": dict(hf_hub="", quick_gelu=True),
    "ViT-B-16/openai": dict(hf_hub="", quick_gelu=True),
    "ViT-bigG-14/laion2b_s39b_b160k": dict(
        hf_hub="laion/CLIP-ViT-bigG-14-laion2B-39B-b160k/", quick_gelu=False),
    "vitlensL": dict(hf_hub="TencentARC/ViT-Lens/vitlensL.pt"),
    "vitlensL_pc": dict(hf_hub="TencentARC/ViT-Lens/vitlensL_pc.pt"),
    "vitlensL_audio": dict(hf_hub="TencentARC/ViT-Lens/vitlensL_audio.pt"),
    "vitlensL_depth": dict(hf_hub="TencentARC/ViT-Lens/vitlensL_depth.pt"),
    "vitlensL_tactile": dict(hf_hub="TencentARC/ViT-Lens/vitlensL_tactile.pt"),
    "vitlensL_eeg": dict(hf_hub="TencentARC/ViT-Lens/vitlensL_eeg.pt"),
}


def cache_dir() -> str:
    return os.environ.get(
        "VITLENS_CKPT_CACHE_DIR",
        os.path.expanduser("~/.cache/vitlens_tpu"))


def get_pretrained_cfg(model: str, tag: str) -> Optional[Dict[str, Any]]:
    return PRETRAINED_REGISTRY.get(f"{model}/{tag}") or PRETRAINED_REGISTRY.get(tag)


def resolve_pretrained(model: str, tag: str) -> str:
    """Tag -> local checkpoint path. Looks in the cache dir first; downloads
    from the HF hub only when the environment has network access."""
    cfg = get_pretrained_cfg(model, tag)
    if cfg is None:
        # allow direct paths
        if os.path.exists(tag):
            return tag
        raise KeyError(f"unknown pretrained tag {model}/{tag}")
    fname = os.path.basename(cfg.get("hf_hub", "").rstrip("/")) or "open_clip_pytorch_model.bin"
    local = os.path.join(cache_dir(), model.replace("/", "_"), fname)
    if os.path.exists(local):
        return local
    try:
        from huggingface_hub import hf_hub_download  # type: ignore

        repo = "/".join(cfg["hf_hub"].split("/")[:2])
        filename = cfg["hf_hub"].split("/", 2)[2] if cfg["hf_hub"].count("/") >= 2 \
            else "open_clip_pytorch_model.bin"
        return hf_hub_download(repo_id=repo, filename=filename or
                               "open_clip_pytorch_model.bin")
    except Exception as e:
        raise RuntimeError(
            f"checkpoint for {model}/{tag} not cached at {local} and download "
            f"failed (offline environment?): {e}"
        ) from e


def push_to_hf_hub(params, config: Dict[str, Any], repo_id: str,
                   commit_message: str = "Add vitlens-tpu checkpoint",
                   private: bool = False, token: Optional[str] = None) -> str:
    """Publish params (as a single npz) + config.json to the HF hub
    (reference push_to_hf_hub.py surface)."""
    import tempfile

    import numpy as np
    import jax

    try:
        from huggingface_hub import HfApi  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("huggingface_hub required for push_to_hf_hub") from e

    with tempfile.TemporaryDirectory() as tmp:
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
        arrays = {}
        for path, leaf in leaves_with_paths:
            key = "/".join(getattr(p, "key", str(p)) for p in path)
            arrays[key] = np.asarray(leaf)
        np.savez(os.path.join(tmp, "params.npz"), **arrays)
        with open(os.path.join(tmp, "config.json"), "w") as f:
            json.dump(config, f, indent=2)
        api = HfApi(token=token)
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_folder(repo_id=repo_id, folder_path=tmp,
                          commit_message=commit_message)
    return f"https://huggingface.co/{repo_id}"
