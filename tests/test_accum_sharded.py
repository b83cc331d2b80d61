"""accum-freq cached-negative replay under shard_map (DP mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vitlens_tpu.models import tri
from vitlens_tpu.train.step import (
    OptimizerConfig, StepConfig, init_train_state, make_optimizer,
    make_train_step,
)
from tests.test_train_step import tiny_batch, tiny_model_cfg


def test_accum_freq_on_mesh():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=50))
    sc = StepConfig(n_tower=3, accum_freq=2, local_loss=True,
                    compute_dtype=jnp.float32, sync_bn=False)
    devs = jax.local_devices(backend="cpu")[:2]
    mesh = Mesh(np.array(devs), ("data",))
    step = make_train_step(cfg, tx, mask, sc, mesh=mesh)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(0), 8)  # 4/shard, 2 micro of 2
    ts, metrics = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    ts, metrics2 = step(ts, batch, jax.random.PRNGKey(2))
    assert float(metrics2["loss"]) != float(metrics["loss"])  # params moved


def test_clip_mode_on_mesh():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=1, total_steps=50))
    sc = StepConfig(n_tower=2, align_to="clip", local_loss=True,
                    compute_dtype=jnp.float32, sync_bn=False)
    devs = jax.local_devices(backend="cpu")[:2]
    mesh = Mesh(np.array(devs), ("data",))
    step = make_train_step(cfg, tx, mask, sc, mesh=mesh)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(1), 8)
    ts, metrics = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
