"""Model factory: config -> (params, state) + jit-able encode functions.

Replaces reference tri_create_model / tri_create_model_and_transforms
(factory.py:164-422) with a functional builder. Checkpoint loading goes
through vitlens_tpu.weights.torch_convert.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vitlens_tpu.config import ModelConfig, make_model_config
from vitlens_tpu.models import tri

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclass
class TriModel:
    """Bundle of config + params/state + bound encode functions.

    A convenience wrapper only — all compute goes through the pure functions
    in vitlens_tpu.models.tri, so pjit/grad can bypass this object entirely.
    """

    cfg: ModelConfig
    params: Params
    state: State
    compute_dtype: Any = jnp.float32

    def encode_image(self, images, normalize: bool = False):
        return _jit_encode_image(self.cfg, self.compute_dtype)(
            self.params, self.state, images, normalize
        )

    def encode_text(self, text, normalize: bool = False):
        return _jit_encode_text(self.cfg, self.compute_dtype)(
            self.params, text, normalize
        )

    def encode_visual(self, x, normalize: bool = False):
        feats, _ = _jit_encode_visual(self.cfg, self.compute_dtype)(
            self.params, self.state, x, normalize
        )
        return feats

    @property
    def logit_scale(self):
        return jnp.exp(self.params["logit_scale"])


@functools.lru_cache(maxsize=32)
def _jit_encode_image(cfg: ModelConfig, compute_dtype):
    @functools.partial(jax.jit, static_argnums=(3,))
    def f(params, state, images, normalize):
        return tri.encode_image(
            params, state, images, cfg,
            normalize=normalize, compute_dtype=compute_dtype,
        )

    return f


@functools.lru_cache(maxsize=32)
def _jit_encode_text(cfg: ModelConfig, compute_dtype):
    @functools.partial(jax.jit, static_argnums=(2,))
    def f(params, text, normalize):
        return tri.encode_text(
            params, text, cfg, normalize=normalize, compute_dtype=compute_dtype
        )

    return f


@functools.lru_cache(maxsize=32)
def _jit_encode_visual(cfg: ModelConfig, compute_dtype):
    @functools.partial(jax.jit, static_argnums=(3,))
    def f(params, state, x, normalize):
        return tri.encode_visual(
            params, state, x, cfg,
            normalize=normalize, compute_dtype=compute_dtype,
        )

    return f


def create_model(
    model: str = "ViT-L-14",
    modality: str = "image",
    *,
    seed: int = 0,
    quick_gelu: bool = False,
    checkpoint_path: Optional[str] = None,
    compute_dtype=jnp.float32,
    **tower_overrides,
) -> TriModel:
    """Build a tri-tower model, optionally loading a torch checkpoint."""
    cfg = make_model_config(model, modality, quick_gelu=quick_gelu, **tower_overrides)
    params, state = tri.tri_model_init(jax.random.PRNGKey(seed), cfg)
    if checkpoint_path is not None:
        from vitlens_tpu.weights.torch_convert import (
            convert_tri_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(checkpoint_path)
        loaded_p, loaded_s = convert_tri_state_dict(sd, cfg)
        params = _merge(params, loaded_p)
        state = _merge(state, loaded_s)
    return TriModel(cfg=cfg, params=params, state=state, compute_dtype=compute_dtype)


def _merge(base, update):
    """Recursively overlay `update` onto `base` (strict=False ckpt loading)."""
    if isinstance(base, dict) and isinstance(update, dict):
        out = dict(base)
        for k, v in update.items():
            out[k] = _merge(base[k], v) if k in base else v
        return out
    return update
