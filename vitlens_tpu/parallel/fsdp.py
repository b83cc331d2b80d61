"""FSDP / ZeRO-style parameter + optimizer-state sharding over the data axis.

The reference scales purely by DDP (torch DistributedDataParallel,
training/distributed.py) — every rank holds full params + full Adam
moments. On TPU the idiomatic upgrade is GSPMD FSDP: store each large
tensor sharded across the `data` axis of the mesh and let XLA insert the
all-gathers (params, forward/backward) and reduce-scatters (grads) over
ICI. Nothing in the model code changes — the train step is jitted with
sharded in/out shardings instead of running under shard_map (see
train/step.py `partition="fsdp"`).

Memory math for the flagship recipe (ViT-L tri, frozen CLIP towers):
replicated DDP keeps ~1.6 GB params + ~2.4 GB Adam moments per chip; on an
8-chip v5e pod slice FSDP cuts the stored copy to ~1/8, freeing ~3.5 GB of
HBM per chip for batch — and for ViT-bigG (2.5 B params) it is the
difference between fitting and not fitting.

Sharding rule: shard the largest axis divisible by the mesh's data-axis
size; small tensors (< `min_elems`) and indivisible shapes stay replicated
(their collective cost would exceed the memory win).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitlens_tpu.parallel.mesh import DATA_AXIS, path_str as _path_str

MIN_ELEMS = 4096  # below this, replication is cheaper than the collectives


def fsdp_spec(shape, n: int, *, axis: str = DATA_AXIS,
              min_elems: int = MIN_ELEMS) -> P:
    """PartitionSpec sharding the largest n-divisible axis, else replicated."""
    if not shape or int(np.prod(shape)) < min_elems:
        return P()
    best = None
    for i, s in enumerate(shape):
        if s % n == 0 and (best is None or s > shape[best]):
            best = i
    if best is None:
        return P()
    return P(*([None] * best + [axis]))


def fsdp_shardings(tree: Any, mesh: Mesh, *,
                   min_elems: int = MIN_ELEMS) -> Any:
    """Per-leaf NamedSharding pytree for params / optimizer state / whole
    TrainStates. Non-array leaves (optax counts are arrays; MaskedNode etc.
    are empty subtrees) never reach the map."""
    n = mesh.shape[DATA_AXIS]

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, n, min_elems=min_elems))

    return jax.tree.map(one, tree)


def fsdp_place(tree: Any, mesh: Mesh, *, min_elems: int = MIN_ELEMS) -> Any:
    """device_put the tree with FSDP shardings (entry point for TrainState
    placement before the first `partition="fsdp"` step).

    Disables the fused Pallas kernels process-wide, like fsdp_tp_place:
    FSDP shards the very weights the kernels take (e.g. the [1024, 4096]
    MLP matrices), and GSPMD cannot propagate shardings through the opaque
    tpu_custom_call — the kernels must not be traced into a GSPMD-jitted
    FSDP step."""
    from vitlens_tpu.ops.fused_mlp import set_fused_mlp_enabled
    from vitlens_tpu.ops.fused_point_encoder import set_point_encoder_enabled

    set_fused_mlp_enabled(False)
    set_point_encoder_enabled(False)
    return jax.device_put(tree, fsdp_shardings(tree, mesh,
                                               min_elems=min_elems))


def shardings_of(tree: Any) -> Any:
    """Read the committed sharding off every leaf of a placed pytree."""
    return jax.tree.map(lambda l: l.sharding, tree)


def fsdp_tp_shardings(ts: Any, mesh: Mesh, *,
                      tp_towers=("visual",),
                      min_elems: int = MIN_ELEMS) -> Any:
    """2D parallelism: FSDP over `data` for everything, EXCEPT the trunk
    weights of the named towers, which take the Megatron TP specs over
    `model` (parallel/tp.py). Optimizer moments follow their parameters
    (matched by path suffix — the Adam mu/nu trees mirror the params tree),
    so no resharding happens between grad and update. The train step needs
    no changes: `partition="fsdp"` jits the global-batch computation and
    GSPMD inserts both the data-axis all-gathers/reduce-scatters and the
    model-axis all-reduces. NB the fused-MLP kernel must be disabled under
    TP (opaque custom call — SCALING.md)."""
    from vitlens_tpu.parallel.tp import vision_tower_specs

    base = fsdp_shardings(ts, mesh, min_elems=min_elems)
    suffix_specs = {}
    for tower in tp_towers:
        specs = vision_tower_specs(ts.params[tower])
        for path, spec in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))[0]:
            if spec != P():
                suffix_specs[f"{tower}/{_path_str(path)}"] = spec

    def override(path, sh):
        ps = _path_str(path)
        for suf, spec in suffix_specs.items():
            # boundary-aware suffix: a tower merely ENDING in another
            # tower's name (e.g. "audio_visual" vs "visual") must not
            # inherit its TP specs
            if ps == suf or ps.endswith("/" + suf):
                return NamedSharding(mesh, spec)
        return sh

    return jax.tree_util.tree_map_with_path(override, base)


def fsdp_tp_place(ts: Any, mesh: Mesh, *, tp_towers=("visual",),
                  min_elems: int = MIN_ELEMS) -> Any:
    """device_put a TrainState with the 2D (FSDP x TP) shardings. Disables
    the fused-MLP kernel process-wide (opaque custom call — GSPMD cannot
    shard through it; see set_fused_mlp_enabled)."""
    from vitlens_tpu.ops.fused_mlp import set_fused_mlp_enabled
    from vitlens_tpu.ops.fused_point_encoder import set_point_encoder_enabled

    set_fused_mlp_enabled(False)
    set_point_encoder_enabled(False)
    return jax.device_put(
        ts, fsdp_tp_shardings(ts, mesh, tp_towers=tp_towers,
                              min_elems=min_elems))
