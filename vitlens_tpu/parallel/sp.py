"""Sequence parallelism for the trunk's inter-block activations.

The reference has no sequence parallelism (SURVEY §2.7); this is TPU-native
headroom that composes with tensor parallelism (parallel/tp.py) for
long-sequence towers (audio fbank N~512-1214, video N~frames*257): the
[B, N, D] activation carried between residual blocks is sharded over the
`model` mesh axis on the SEQUENCE dim, Megatron-SP style. Expressed as a
`with_sharding_constraint` applied to the scan carry at each block boundary
(models/layers.py::set_activation_constraint) — GSPMD then schedules the
surrounding collectives (gather where attention needs the full sequence,
scatter back after the row-parallel matmuls) over ICI, and the resident
activation footprint between blocks drops to 1/TP per chip.

Numerics are unchanged (a sharding constraint is the identity) — asserted
against the unconstrained trunk in tests/test_sp.py.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitlens_tpu.models.layers import set_activation_constraint
from vitlens_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@contextmanager
def sequence_sharded_activations(mesh: Mesh):
    """Trace-time context: trunks traced inside carry sequence-sharded
    inter-block activations over `mesh`'s model axis (batch stays on `data`
    if present). Use around the jit/lower call, e.g.::

        with sequence_sharded_activations(tp_mesh):
            feats = jax.jit(encode)(params, x)
    """
    batch = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None
    sh = NamedSharding(mesh, P(batch, MODEL_AXIS, None))

    def constrain(x):
        if x.ndim != 3:
            return x
        return jax.lax.with_sharding_constraint(x, sh)

    set_activation_constraint(constrain)
    try:
        yield
    finally:
        set_activation_constraint(None)
