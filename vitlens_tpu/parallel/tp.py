"""Tensor-parallel parameter shardings (bigG headroom).

The reference has no TP (SURVEY §2.7) — this is TPU-native headroom for
ViT-bigG-scale towers: Megatron-style shardings over the `model` mesh axis,
expressed purely as NamedShardings on the parameter pytree. XLA/GSPMD then
inserts the collectives (the all-reduce after the row-parallel matmuls rides
ICI) — no model-code changes needed.

Layout per trunk layer (stacked leading `layers` axis preserved):
  qkv_w  [L, D, 3D]  -> shard the 3D output dim   (column parallel)
  out_w  [L, D, D]   -> shard the input dim       (row parallel)
  mlp fc [L, D, H]   -> shard H                    (column parallel)
  mlp proj [L, H, D] -> shard H                    (row parallel)
  biases of column-parallel layers shard with their outputs; everything
  else (LN, embeddings, pos, proj) replicated.

NOTE on exactness: sharding the packed qkv output dim slices [q|k|v]
contiguously across devices; attention itself stays exact because GSPMD
all-gathers the (small) per-token qkv activations before the reshape-to-
heads — the win is sharding the big weight matmuls, which dominate.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitlens_tpu.parallel.mesh import MODEL_AXIS, path_str as _path_str

Params = Dict[str, Any]


def _trunk_blocks_specs() -> Params:
    m = MODEL_AXIS
    return {
        "attn": {
            "qkv_w": P(None, None, m),   # [L, D, 3D] column parallel
            "qkv_b": P(None, m),
            "out_w": P(None, m, None),   # [L, D, D] row parallel
            "out_b": P(),
        },
        "mlp": {
            "fc": {"w": P(None, None, m), "b": P(None, m)},
            "proj": {"w": P(None, m, None), "b": P()},
        },
    }


def vision_tower_specs(params: Params) -> Params:
    """PartitionSpec pytree for one vision tower's params: trunk TP-sharded,
    everything else (LN/embeddings/adapter/perceiver/proj) replicated."""
    specs = jax.tree.map(lambda _: P(), params)
    blocks_specs = dict(jax.tree.map(lambda _: P(), params["trunk"]["blocks"]))
    for key, sub in _trunk_blocks_specs().items():
        if key in blocks_specs:
            blocks_specs[key] = sub
    specs = dict(specs)
    specs["trunk"] = {"blocks": blocks_specs}
    return specs


def shard_vision_tower(params: Params, mesh: Mesh) -> Params:
    """device_put the tower params with TP shardings over `mesh`.

    Also disables the fused-MLP Pallas kernel process-wide: GSPMD cannot
    shard through its opaque custom call (SCALING.md), and forgetting the
    env kill-switch would otherwise break every TP run."""
    from vitlens_tpu.ops.fused_mlp import set_fused_mlp_enabled
    from vitlens_tpu.ops.fused_point_encoder import set_point_encoder_enabled

    set_fused_mlp_enabled(False)
    set_point_encoder_enabled(False)
    specs = vision_tower_specs(params)
    spec_map = {
        _path_str(path): s
        for path, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    }

    def place(path, leaf):
        s = spec_map.get(_path_str(path), P())
        return jax.device_put(leaf, NamedSharding(mesh, s))

    return jax.tree_util.tree_map_with_path(place, params)
