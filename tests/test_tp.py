"""Tensor-parallel shardings: forward on a [data=2, model=4] mesh matches
the unsharded forward exactly (GSPMD inserts the collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vitlens_tpu.config import (
    EEGAdapterConfig, PerceiverConfig, TowerConfig, VisionArch,
)
from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
from vitlens_tpu.parallel.mesh import make_mesh
from vitlens_tpu.parallel.tp import shard_vision_tower, vision_tower_specs


def _tower():
    arch = VisionArch(image_size=28, patch_size=14, width=64, layers=2,
                      head_width=16)
    return TowerConfig(
        arch=arch, embed_dim=32, modality="eeg",
        eeg=EEGAdapterConfig(chans=8, time_len=16, window_size=1, stride=1),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=64,
                                  input_dim=64, cross_heads=1,
                                  cross_dim_head=16, latent_heads=2,
                                  latent_dim_head=32),
    )


def test_tp_forward_matches_unsharded():
    tower = _tower()
    params, state = vision_tower_init(jax.random.PRNGKey(0), tower)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 16), jnp.float32)
    want, _ = vision_tower_apply(params, state, x, tower)

    mesh = make_mesh(n_data=2, n_model=4,
                     devices=jax.local_devices(backend="cpu"))
    sharded_params = shard_vision_tower(params, mesh)
    # check the sharding actually took effect on a TP leaf
    qkv = sharded_params["trunk"]["blocks"]["attn"]["qkv_w"]
    assert qkv.sharding.spec == P(None, None, "model")

    @jax.jit
    def fwd(p, x):
        out, _ = vision_tower_apply(p, state, x, tower)
        return out

    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = fwd(sharded_params, x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_specs_cover_all_leaves():
    tower = _tower()
    params, _ = vision_tower_init(jax.random.PRNGKey(1), tower)
    specs = vision_tower_specs(params)
    n_p = len(jax.tree.leaves(params))
    n_s = len(jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))
    assert n_s >= 1
    # sharding the params with the specs must succeed for every leaf
    mesh = make_mesh(n_data=2, n_model=4,
                     devices=jax.local_devices(backend="cpu"))
    sharded = shard_vision_tower(params, mesh)
    assert len(jax.tree.leaves(sharded)) == n_p
