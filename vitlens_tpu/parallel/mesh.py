"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's torch.distributed runtime
(/root/reference/vitlens/src/training/distributed.py:12-144 and the NCCL
all_gather in loss.py): a `jax.sharding.Mesh` with a `data` axis spanning
ICI (and DCN across slices), batches sharded over `data`, parameters
replicated (the published recipes are pure DDP — SURVEY §2.7), with optional
`model` axis hooks for ViT-bigG-scale tensor-parallel headroom.

Process bootstrap (the SLURM/torchrun env discovery of distributed.py) is
handled by jax.distributed.initialize on multi-host; single-host needs none.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> int:
    """Multi-host bootstrap (the torchrun/SLURM env discovery of reference
    distributed.py:24-121). Discovery order:

    - torchrun-style MASTER_ADDR/MASTER_PORT + WORLD_SIZE/RANK (the
      reference's primary path, distributed.py:24-69)
    - SLURM_NTASKS/SLURM_PROCID (+ optional COORDINATOR_ADDRESS override;
      without it jax.distributed's SlurmCluster plugin auto-detects the
      rank-0 coordinator from SLURM_STEP_NODELIST)
    - bare COORDINATOR_ADDRESS -> jax.distributed.initialize() auto-detect
      (TPU-pod metadata et al.)

    Single-process (none of the above): no-op. Returns the process index."""
    import os

    # NB: jax.process_count() would INITIALIZE the backends and lock the
    # process into single-host mode — probe the distributed client instead
    if jax.distributed.is_initialized():
        return jax.process_index()
    env = os.environ
    addr = env.get("COORDINATOR_ADDRESS")
    nproc = pid = None
    if env.get("WORLD_SIZE", "1") not in ("", "1"):
        # WORLD_SIZE>1 is an explicit multi-host request: a missing
        # MASTER_ADDR must be LOUD, not a silent fall-through to N
        # independent single-host jobs (duplicated data, clobbered ckpts)
        if not (addr or env.get("MASTER_ADDR")):
            raise RuntimeError(
                f"WORLD_SIZE={env['WORLD_SIZE']} but neither MASTER_ADDR "
                "nor COORDINATOR_ADDRESS is set — cannot bootstrap the "
                "distributed runtime")
        addr = addr or (f"{env['MASTER_ADDR']}:"
                        f"{env.get('MASTER_PORT', '29500')}")
        if "RANK" not in env:
            raise RuntimeError(
                f"WORLD_SIZE={env['WORLD_SIZE']} but RANK is not set — "
                "every process needs its torchrun-style rank")
        nproc, pid = int(env["WORLD_SIZE"]), int(env["RANK"])
    elif env.get("SLURM_NTASKS", "1") not in ("", "1"):
        if addr:
            nproc, pid = int(env["SLURM_NTASKS"]), int(env["SLURM_PROCID"])
        else:
            # standard sbatch launch: jax.distributed's SlurmCluster plugin
            # auto-detects the coordinator (rank-0 node from
            # SLURM_STEP_NODELIST), process count and id — no extra env
            # needed. Auto-detect failure must still be LOUD, not a silent
            # fall-through to N independent single-host jobs.
            try:
                jax.distributed.initialize()
            except Exception as e:  # noqa: BLE001 - plugin failures vary:
                # nodelist parsing raises ValueError/KeyError, not just
                # RuntimeError; all deserve the actionable hint. Only the
                # benign double-init RuntimeError passes through.
                if (isinstance(e, RuntimeError)
                        and "already initialized" in str(e)):
                    pass
                else:
                    raise RuntimeError(
                        f"SLURM_NTASKS={env['SLURM_NTASKS']} but JAX's "
                        "SLURM auto-detection failed — export "
                        "COORDINATOR_ADDRESS (host:port of rank 0) in the "
                        "sbatch script") from e
            return jax.process_index()
    if nproc is not None:
        try:
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=nproc, process_id=pid)
        except RuntimeError as e:
            # ONLY the double-init race is benign. A connect failure must be
            # loud: swallowing it would leave every rank running an
            # independent single-host job (duplicated data, clobbered
            # checkpoints).
            if "already initialized" not in str(e):
                raise
    elif addr:
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            if "already initialized" not in str(e):
                raise
    return jax.process_index()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a [data, model] mesh. Defaults to all devices on `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spans_processes(mesh: Mesh) -> bool:
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def path_str(path) -> str:
    """Stringify a tree_flatten_with_path key path as a/b/c. THE single
    canonical stringifier: the TP/FSDP spec matchers, checkpoint leaf
    naming and hub export all use it — both sides of any path-keyed
    matching MUST produce identical strings, so don't fork local copies.
    Handles DictKey (.key), GetAttrKey (.name) and SequenceKey (.idx)."""
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding.

    On a multi-host mesh each process passes its LOCAL slice of the global
    batch (the per-rank batch of the reference's DistributedSampler) and a
    global jax.Array is assembled from the process-local shards."""
    s = data_sharding(mesh)
    if _spans_processes(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    if _spans_processes(mesh):
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, r, lambda i: x[i])

        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def broadcast_object(obj, root: int = 0):
    """Broadcast a picklable object from the root process (reference
    distributed.py broadcast_object; used e.g. to agree on the resume
    checkpoint path). Single-process: identity.

    multihost_utils only moves arrays, so the object is pickled to a uint8
    payload: first the length is broadcast (so non-root ranks can allocate
    a same-shape buffer), then the payload."""
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    is_src = jax.process_index() == root
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.array(len(payload), np.int64), is_source=is_src))
    buf = payload if is_src else np.zeros(n, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
    return pickle.loads(np.asarray(out).tobytes())


def all_gather_object(obj):
    """Gather per-process picklable objects to every process (reference
    distributed.py all_gather_object). Single-process: [obj]. Same pickled
    uint8 protocol as broadcast_object, padded to the max payload length."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.array(len(payload), np.int64))).reshape(-1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: len(payload)] = payload
    allbuf = np.asarray(multihost_utils.process_allgather(buf))
    return [pickle.loads(allbuf[i, : int(lens[i])].tobytes())
            for i in range(len(lens))]
