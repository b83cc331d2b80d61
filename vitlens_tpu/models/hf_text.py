"""HuggingFace text encoder tower (open_clip-compat component).

Mirrors /root/reference/vitlens/src/open_clip/hf_model.py (231 LoC): wrap a
transformers AutoModel as the text tower with a pooler (cls / mean /
cls-last-hidden-state) and a linear or MLP projection to embed_dim.

The transformers package is baked into this image but model WEIGHTS require
network access (this environment is zero-egress), so construction is gated:
pass a local `model_path`, or construction raises a clear error. Inference
runs the torch module on host CPU and returns numpy — HF towers are anchor
encoders (frozen), never on the TPU hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class HFTextEncoder:
    """pooler_type in {cls_pooler, mean_pooler, cls_last_hidden_state_pooler};
    proj in {linear, mlp} (reference hf_model.py ClsPooler/MeanPooler and
    proj construction)."""

    def __init__(self, model_name_or_path: str, output_dim: int,
                 pooler_type: str = "mean_pooler", proj: str = "linear",
                 pretrained: bool = True):
        try:
            import torch
            import torch.nn as nn
            from transformers import AutoConfig, AutoModel
        except ImportError as e:  # pragma: no cover
            raise ImportError("transformers required for HFTextEncoder") from e

        self.torch = torch
        if pretrained:
            try:
                self.transformer = AutoModel.from_pretrained(model_name_or_path)
            except Exception as e:
                raise RuntimeError(
                    f"could not load HF weights for {model_name_or_path!r} "
                    "(offline environment?); pass a local path"
                ) from e
        else:
            cfg = AutoConfig.from_pretrained(model_name_or_path)
            self.transformer = AutoModel.from_config(cfg)
        self.transformer.eval()
        self.pooler_type = pooler_type
        d_model = self.transformer.config.hidden_size
        if proj == "linear":
            self.proj = nn.Linear(d_model, output_dim, bias=False)
        else:  # mlp
            hidden = (d_model + output_dim) // 2
            self.proj = nn.Sequential(
                nn.Linear(d_model, hidden, bias=False), nn.GELU(),
                nn.Linear(hidden, output_dim, bias=False),
            )
        self.proj.eval()

    def _pool(self, out, attention_mask):
        torch = self.torch
        h = out.last_hidden_state
        if self.pooler_type == "cls_pooler":
            if hasattr(out, "pooler_output") and out.pooler_output is not None:
                return out.pooler_output
            return h[:, 0]
        if self.pooler_type == "cls_last_hidden_state_pooler":
            return h[:, 0]
        # mean pooler with mask
        m = attention_mask.unsqueeze(-1).to(h.dtype)
        return (h * m).sum(1) / m.sum(1).clamp(min=1)

    def encode(self, input_ids: np.ndarray,
               attention_mask: Optional[np.ndarray] = None) -> np.ndarray:
        torch = self.torch
        ids = torch.from_numpy(np.asarray(input_ids)).long()
        if attention_mask is None:
            attention_mask = (ids != 0).long()
        else:
            attention_mask = torch.from_numpy(np.asarray(attention_mask)).long()
        with torch.no_grad():
            out = self.transformer(input_ids=ids, attention_mask=attention_mask)
            pooled = self._pool(out, attention_mask)
            return self.proj(pooled).numpy()
