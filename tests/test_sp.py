"""Sequence parallelism: sequence-sharded inter-block activations leave the
trunk numerically unchanged, and the constraint actually reaches the lowered
module (collectives appear over the model axis)."""

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.models.layers import gelu, transformer, transformer_init
from vitlens_tpu.parallel.mesh import make_mesh
from vitlens_tpu.parallel.sp import sequence_sharded_activations

DIM, HEADS, LAYERS = 32, 2, 3


def test_sp_forward_matches_unconstrained():
    p = transformer_init(jax.random.PRNGKey(0), DIM, LAYERS)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, DIM), jnp.float32)
    want = transformer(x, p, HEADS, gelu)

    mesh = make_mesh(n_data=2, n_model=4,
                     devices=jax.local_devices(backend="cpu"))
    with sequence_sharded_activations(mesh):
        got = jax.jit(lambda p, x: transformer(x, p, HEADS, gelu))(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_sp_constraint_reaches_lowering():
    p = transformer_init(jax.random.PRNGKey(1), DIM, LAYERS)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, DIM), jnp.float32)
    mesh = make_mesh(n_data=1, n_model=8,
                     devices=jax.local_devices(backend="cpu"))
    with sequence_sharded_activations(mesh):
        ir = jax.jit(
            lambda p, x: transformer(x, p, HEADS, gelu)).lower(p, x).as_text()
    # the [B, N, D] carry must be constrained to a model-axis sequence shard
    assert "sharding_constraint" in ir or "Sharding" in ir


def test_sp_context_resets_hook():
    from vitlens_tpu.models import layers

    mesh = make_mesh(n_data=1, n_model=8,
                     devices=jax.local_devices(backend="cpu"))
    with sequence_sharded_activations(mesh):
        assert layers._ACTIVATION_CONSTRAINT is not None
    assert layers._ACTIVATION_CONSTRAINT is None
