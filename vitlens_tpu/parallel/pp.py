"""Pipeline parallelism for the stacked-layer trunk (GPipe schedule).

The reference has no pipeline parallelism (SURVEY §2.7 — every published
ViT-Lens recipe is pure DDP); this is TPU-native headroom for trunks too
deep/wide to replicate per chip (ViT-bigG and beyond). Because the trunk is
already ONE `lax.scan` over stacked [L, ...] layer params
(models/layers.py::transformer), pipelining is a sharding of that same
structure: the leading layer axis is split over a `pipe` mesh axis (stage i
holds layers [i*L/S, (i+1)*L/S)), and M microbatches stream through the S
stages in S+M-1 ticks, activations hopping stage-to-stage with
`lax.ppermute` over ICI.

Differentiability: `ppermute` transposes to the reverse permute, so
`jax.grad` through `pipeline_transformer` yields a correct pipelined
backward (reverse schedule, same bubble) — verified against the
single-device trunk in tests/test_pp.py.

Efficiency model (v5e): bubble fraction = (S-1)/(S-1+M); per-hop payload is
one microbatch of activations (mb*N*D*2 bytes bf16), which at ViT-bigG
shapes (~mb 8 x 257 x 1664 ≈ 6.8 MB) costs ~0.15 ms/hop at 45 GB/s
ICI — negligible vs a multi-layer stage. Choose M >= 4*S_... practically
M >= 4S keeps the bubble under ~20%.

Composition: the mesh may carry a leading `data` axis ([data, pipe]); the
microbatch batch dim is then sharded over `data` (DP x PP). TP/FSDP compose
on the weight axes of the per-stage shards exactly as in parallel/tp.py —
not wired here because no released config needs 3D.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitlens_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"

Params = Dict[str, Any]


def make_pipe_mesh(
    n_stages: int,
    n_data: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """[data, pipe] mesh; the pipe axis is innermost so stage hops ride
    neighbouring ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_stages <= len(devices), (n_data, n_stages, len(devices))
    arr = np.array(devices[: n_data * n_stages]).reshape(n_data, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def shard_trunk_pipeline(trunk_params: Params, mesh: Mesh) -> Params:
    """device_put stacked trunk params ({"blocks": [L, ...] leaves}) with the
    layer axis sharded over `pipe` (everything stays one jax.Array; GSPMD
    sees stage-local shards inside shard_map)."""
    n_stages = mesh.shape[PIPE_AXIS]
    layers = jax.tree.leaves(trunk_params["blocks"])[0].shape[0]
    assert layers % n_stages == 0, (
        f"trunk depth {layers} not divisible by {n_stages} pipeline stages")
    sh = NamedSharding(mesh, P(PIPE_AXIS))
    return {"blocks": jax.tree.map(lambda t: jax.device_put(t, sh),
                                   trunk_params["blocks"])}


def pipeline_transformer(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    act: Callable,
    mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    n_microbatches: int,
    remat: bool = False,
    ln_eps: float = 1e-5,
    tail_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Drop-in for models/layers.py::transformer over a [data?, pipe] mesh.

    x: [B, N, D] (batch sharded over `data` if the mesh has one); p:
    {"blocks": stacked [L, ...]} sharded over `pipe` (shard_trunk_pipeline).
    Output matches `transformer(x, p, ...)` exactly (same op order per
    microbatch; tests/test_pp.py asserts equality to the single-device
    trunk at fp32).

    Memory note (SCALING.md "PP memory profile"): the banked-output carry is
    full-batch-sized on EVERY stage — under shard_map every stage runs the
    same SPMD program, so last-stage-only banking is not expressible; the
    bank costs B*N*D*2 bytes bf16 per stage. `tail_fn` is the relief: a
    per-microbatch head (e.g. ln_post -> pool -> proj, [mb,N,D] -> [mb,D])
    applied ON the last stage before banking, shrinking the bank (and the
    closing psum payload) by ~N x. The returned value is then
    tail_fn(trunk(x)) per microbatch, shape [B, *tail_shape].
    """
    from vitlens_tpu.models.layers import resblock

    n_stages = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape.get(DATA_AXIS, 1)
    B = x.shape[0]
    M = n_microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    mb = B // M
    assert mb % n_data == 0, (
        f"microbatch {mb} not divisible by data axis {n_data}")
    x_mb = x.reshape(M, mb, *x.shape[1:])

    def stage_fn(x_mb, blocks_local):
        # blocks_local: [L/S, ...] — this stage's layers
        stage = jax.lax.axis_index(PIPE_AXIS)

        def body(carry, layer_p):
            return resblock(carry, layer_p, heads, act, mask, ln_eps), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)

        def local_apply(h):
            out, _ = jax.lax.scan(body, h, blocks_local)
            return out

        T = M + n_stages - 1

        def bank(h):
            return tail_fn(h) if tail_fn is not None else h

        def tick(carry, t):
            recv, outputs = carry
            feed = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            h = jnp.where(stage == 0, feed, recv)
            out = local_apply(h)
            # the last stage banks microbatch t-(S-1) once it's real work,
            # not bubble; other stages' buffers are zeroed before the psum
            j = jnp.clip(t - (n_stages - 1), 0, M - 1)
            banked = bank(out)
            cur = jax.lax.dynamic_index_in_dim(outputs, j, axis=0,
                                               keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(t >= n_stages - 1, banked, cur), j, axis=0)
            recv = jax.lax.ppermute(
                out, PIPE_AXIS,
                [(i, i + 1) for i in range(n_stages - 1)])
            return (recv, outputs), None

        bank_shape = jax.eval_shape(bank, x_mb[0])
        init = (jnp.zeros_like(x_mb[0]),
                jnp.zeros((M,) + bank_shape.shape, bank_shape.dtype))
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(T))
        # replicate the last stage's banked outputs to every stage so the
        # out_spec stays P(...) over data only (one psum over `pipe`; in a
        # full PP deployment the head would instead run on the last stage)
        outputs = jnp.where(stage == n_stages - 1, outputs,
                            jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, PIPE_AXIS)

    batch_sub = DATA_AXIS if n_data > 1 else None
    out = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(None, batch_sub), P(PIPE_AXIS)),
        out_specs=P(None, batch_sub),
        check_vma=False,
    )(x_mb, p["blocks"])
    return out.reshape(B, *out.shape[2:])


@contextmanager
def pipelined_trunks(mesh: Mesh, n_microbatches: int):
    """Trace-time context: every `models/layers.py::transformer` traced
    inside runs the GPipe schedule over `mesh`'s pipe axis — so a FULL
    tower forward (adapter + trunk + perceiver + proj) pipelines its trunk
    with no model-code changes. Trunks whose depth doesn't divide the
    stage count (e.g. the 1-block perceiver) silently keep the plain scan.
    Shard the tower's trunk blocks with `shard_trunk_pipeline` (or a
    whole-tower `pipeline_place`) first so the stages own their layers.

        with pipelined_trunks(pipe_mesh, n_microbatches=8):
            feats = jax.jit(encode)(params, x)
    """
    from vitlens_tpu.models.layers import set_trunk_pipeline

    set_trunk_pipeline((mesh, n_microbatches))
    try:
        yield
    finally:
        set_trunk_pipeline(None)


def pipeline_place(tower_params: Params, mesh: Mesh) -> Params:
    """device_put a whole vision-tower param tree for PP: trunk blocks
    layer-sharded over `pipe` (when divisible), everything else
    replicated."""
    repl = NamedSharding(mesh, P())
    trunk = (tower_params.get("trunk")
             if isinstance(tower_params, dict) else None)
    pipe_blocks = None
    if trunk and "blocks" in trunk:
        layers = jax.tree.leaves(trunk["blocks"])[0].shape[0]
        if layers % mesh.shape[PIPE_AXIS] == 0:
            # shard the (largest) trunk weights directly — replicating them
            # first would double H2D traffic and transiently hold a full
            # copy per chip, defeating PP's memory point
            pipe_blocks = shard_trunk_pipeline(
                {"blocks": trunk["blocks"]}, mesh)["blocks"]

    def place(path, leaf):
        if pipe_blocks is not None and len(path) >= 2 and (
                getattr(path[0], "key", None) == "trunk"
                and getattr(path[1], "key", None) == "blocks"):
            return leaf  # replaced wholesale below, already pipe-sharded
        return jax.device_put(leaf, repl)

    placed = jax.tree_util.tree_map_with_path(place, tower_params)
    if pipe_blocks is not None:
        placed = dict(placed)
        placed["trunk"] = dict(placed["trunk"])
        placed["trunk"]["blocks"] = pipe_blocks
    return placed
