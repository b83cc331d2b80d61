"""FSDP (GSPMD ZeRO) train-step path: sharded == single-device numerics,
params/opt actually stored sharded, sharding stability across steps, and
the sharding rule itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tests.test_train_step import tiny_batch, tiny_model_cfg
from vitlens_tpu.models import tri
from vitlens_tpu.parallel.fsdp import (
    fsdp_place,
    fsdp_shardings,
    fsdp_spec,
)
from vitlens_tpu.train.freeze import tri_model_mask
from vitlens_tpu.train.step import (
    OptimizerConfig,
    StepConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_fsdp_spec_rule():
    assert fsdp_spec((1024, 4096), 8) == P(None, "data")
    assert fsdp_spec((4096, 1024), 8) == P("data")
    assert fsdp_spec((24, 4096, 1024), 8) == P(None, "data")
    # indivisible and small shapes replicate
    assert fsdp_spec((1023, 17), 8) == P()
    assert fsdp_spec((64,), 8) == P()
    assert fsdp_spec((), 8) == P()


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def _mesh(n=4):
    devs = jax.local_devices(backend="cpu")[:n]
    return Mesh(np.array(devs), ("data",))


def test_fsdp_step_matches_single_device(setup):
    cfg, params, state = setup
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100)
    )
    batch = tiny_batch(np.random.RandomState(1), 16)
    # single-device reference: global loss (= what the fsdp path computes)
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    single = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts1 = init_train_state(params, state, tx)
    ts1, m1 = single(ts1, batch, None)

    mesh = _mesh()
    fstep = make_train_step(cfg, tx, mask, sc, mesh=mesh, partition="fsdp")
    ts2 = fsdp_place(init_train_state(params, state, tx), mesh, min_elems=128)
    ts2, m2 = fstep(ts2, batch, None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fsdp_state_stays_sharded_across_steps(setup):
    """Params/opt leaves big enough to shard are stored distributed, and the
    output state of every step keeps the same shardings (no silent
    re-replication)."""
    cfg, params, state = setup
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100), mask)
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    mesh = _mesh()
    fstep = make_train_step(cfg, tx, mask, sc, mesh=mesh, partition="fsdp")
    ts = fsdp_place(init_train_state(params, state, tx), mesh, min_elems=128)

    want = jax.tree.map(lambda l: l.sharding.spec, ts.params)
    n_sharded = sum(
        1 for s in jax.tree.leaves(want, is_leaf=lambda x: isinstance(x, P))
        if s != P())
    assert n_sharded > 0, "no parameter leaf ended up sharded"

    batch = tiny_batch(np.random.RandomState(2), 8)
    for i in range(2):
        ts, metrics = fstep(ts, batch, None)
        assert np.isfinite(float(metrics["loss"]))
    got = jax.tree.map(lambda l: l.sharding.spec, ts.params)
    assert got == want


def test_fsdp_shardings_handles_opt_state(setup):
    """The rule maps over masked optax state (MaskedNode subtrees, scalar
    counts) without error, sharding the Adam moments of trainable leaves."""
    cfg, params, state = setup
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100), mask)
    ts = init_train_state(params, state, tx)
    sh = fsdp_shardings(ts, _mesh(), min_elems=128)
    specs = [s.spec for s in jax.tree.leaves(sh.opt_state)
             if hasattr(s, "spec")]
    assert any(s != P() for s in specs), "no optimizer moment sharded"


def test_fsdp_accum_and_bf16_composes(setup):
    """partition='fsdp' composes with accum-freq cached-negative replay,
    bf16 compute, and frozen towers; matches the single-device accum step."""
    cfg, params, state = setup
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100), mask)
    sc = StepConfig(n_tower=3, local_loss=False, accum_freq=2,
                    compute_dtype=jnp.float32, sync_bn=False)
    batch = tiny_batch(np.random.RandomState(3), 16)

    single = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts1 = init_train_state(params, state, tx)
    ts1, m1 = single(ts1, batch, None)

    mesh = _mesh()
    fstep = make_train_step(cfg, tx, mask, sc, mesh=mesh, partition="fsdp")
    ts2 = fsdp_place(init_train_state(params, state, tx), mesh,
                     min_elems=128)
    ts2, m2 = fstep(ts2, batch, None)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # bf16 + remat smoke through the fsdp path
    scb = StepConfig(n_tower=3, local_loss=False,
                     compute_dtype=jnp.bfloat16, remat=True, sync_bn=False)
    bstep = make_train_step(cfg, tx, mask, scb, mesh=mesh, partition="fsdp")
    ts3 = fsdp_place(init_train_state(params, state, tx), mesh,
                     min_elems=128)
    ts3, m3 = bstep(ts3, batch, None)
    assert np.isfinite(float(m3["loss"]))


def test_fsdp_tp_2d_step_matches_single_device(setup):
    """2D parallelism: FSDP over `data` x Megatron TP over `model` for the
    visual trunk (parallel/fsdp.py::fsdp_tp_place) — same step factory,
    GSPMD inserts both axes' collectives; numerics == single device."""
    from vitlens_tpu.parallel.fsdp import fsdp_tp_place
    from vitlens_tpu.parallel.mesh import make_mesh

    cfg, params, state = setup
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=100))
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    batch = tiny_batch(np.random.RandomState(5), 16)

    single = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts1 = init_train_state(params, state, tx)
    ts1, m1 = single(ts1, batch, None)

    devs = jax.local_devices(backend="cpu")[:8]
    mesh = make_mesh(n_data=2, n_model=4, devices=devs)
    fstep = make_train_step(cfg, tx, mask, sc, mesh=mesh, partition="fsdp")
    ts2 = fsdp_tp_place(init_train_state(params, state, tx), mesh,
                        min_elems=128)
    # the visual trunk must actually be model-axis sharded
    spec = ts2.params["visual"]["trunk"]["blocks"]["attn"]["qkv_w"].sharding.spec
    assert spec == P(None, None, "model"), spec
    ts2, m2 = fstep(ts2, batch, None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
