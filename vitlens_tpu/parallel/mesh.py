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
    distributed.py:24-121). jax.distributed.initialize reads
    COORDINATOR_ADDRESS/num_processes/process_id from standard env vars
    (incl. SLURM) on TPU pods; single-host is a no-op. Returns process
    index."""
    import os

    if (os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1")):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized
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


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def broadcast_object(obj, root: int = 0):
    """Broadcast a picklable object from the root process (reference
    distributed.py broadcast_object; used e.g. to agree on the resume
    checkpoint path). Single-process: identity."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils  # pragma: no cover

    return multihost_utils.broadcast_one_to_all(obj)  # pragma: no cover


def all_gather_object(obj):
    """Gather per-process objects to every process (reference
    distributed.py all_gather_object). Single-process: [obj]."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils  # pragma: no cover

    return list(multihost_utils.process_allgather(obj))  # pragma: no cover
