"""Pipeline parallelism: the GPipe-scheduled trunk on a [data, pipe] mesh
matches the single-device `transformer` exactly, forward and backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.models.layers import gelu, transformer, transformer_init
from vitlens_tpu.parallel.pp import (
    make_pipe_mesh, pipeline_transformer, shard_trunk_pipeline,
)

DIM, HEADS, LAYERS = 32, 2, 4


def _trunk(key=0):
    return transformer_init(jax.random.PRNGKey(key), DIM, LAYERS)


def _x(b=8, n=6):
    return jnp.asarray(np.random.RandomState(0).randn(b, n, DIM), jnp.float32)


def test_pp_forward_matches_single_device():
    p = _trunk()
    x = _x()
    want = transformer(x, p, HEADS, gelu)

    mesh = make_pipe_mesh(n_stages=4, n_data=2,
                          devices=jax.local_devices(backend="cpu"))
    p_sharded = shard_trunk_pipeline(p, mesh)

    @jax.jit
    def fwd(p, x):
        return pipeline_transformer(x, p, HEADS, gelu, mesh=mesh,
                                    n_microbatches=4)

    got = fwd(p_sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_pp_pipe_only_mesh_and_uneven_microbatches():
    p = _trunk(1)
    x = _x(b=6)
    want = transformer(x, p, HEADS, gelu)
    mesh = make_pipe_mesh(n_stages=2,
                          devices=jax.local_devices(backend="cpu")[:2])
    p_sharded = shard_trunk_pipeline(p, mesh)
    got = jax.jit(lambda p, x: pipeline_transformer(
        x, p, HEADS, gelu, mesh=mesh, n_microbatches=3))(p_sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_pp_backward_matches_single_device():
    p = _trunk(2)
    x = _x(b=4, n=5)
    mesh = make_pipe_mesh(n_stages=4,
                          devices=jax.local_devices(backend="cpu")[:4])
    p_sharded = shard_trunk_pipeline(p, mesh)

    def loss_single(p, x):
        return jnp.sum(transformer(x, p, HEADS, gelu) ** 2)

    def loss_pp(p, x):
        return jnp.sum(pipeline_transformer(
            x, p, HEADS, gelu, mesh=mesh, n_microbatches=4, remat=True) ** 2)

    want = jax.grad(loss_single)(p, x)
    got = jax.jit(jax.grad(loss_pp))(p_sharded, x)
    jax.tree.map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-4),
        got, want)


def test_pp_full_tower_via_pipelined_trunks():
    """A whole vision-tower forward (adapter + trunk + perceiver + proj)
    pipelines its 2-layer trunk under the trace-time hook; the 1-block
    perceiver doesn't divide the stage count and silently keeps the scan."""
    from vitlens_tpu.config import (
        EEGAdapterConfig, PerceiverConfig, TowerConfig, VisionArch,
    )
    from vitlens_tpu.models.vit import vision_tower_apply, vision_tower_init
    from vitlens_tpu.parallel.pp import pipeline_place, pipelined_trunks

    arch = VisionArch(image_size=28, patch_size=14, width=64, layers=2,
                      head_width=16)
    tower = TowerConfig(
        arch=arch, embed_dim=32, modality="eeg",
        eeg=EEGAdapterConfig(chans=8, time_len=16, window_size=1, stride=1),
        perceiver=PerceiverConfig(depth=1, num_latents=4, latent_dim=64,
                                  input_dim=64, cross_heads=1,
                                  cross_dim_head=16, latent_heads=2,
                                  latent_dim_head=32),
    )
    params, state = vision_tower_init(jax.random.PRNGKey(5), tower)
    x = jnp.asarray(np.random.RandomState(5).randn(4, 8, 16), jnp.float32)
    want, _ = vision_tower_apply(params, state, x, tower)

    mesh = make_pipe_mesh(n_stages=2, n_data=2,
                          devices=jax.local_devices(backend="cpu")[:4])
    placed = pipeline_place(params, mesh)
    with pipelined_trunks(mesh, n_microbatches=2):
        got, _ = jax.jit(
            lambda p, x: vision_tower_apply(p, state, x, tower))(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_pp_tail_fn_banks_head_output():
    """Last-stage tail (ln-free pool+proj stand-in) banked per microbatch:
    output equals tail(trunk(x)) and the bank is [M, mb, D_out] instead of
    [M, mb, N, D] — the PP memory-relief path (SCALING.md PP profile)."""
    p = _trunk(4)
    x = _x(b=8, n=6)
    rng = np.random.RandomState(7)
    W = jnp.asarray(rng.randn(DIM, 16) / np.sqrt(DIM), jnp.float32)

    def tail(h):  # [mb, N, D] -> [mb, 16]
        return h.mean(axis=1) @ W

    want = tail(transformer(x, p, HEADS, gelu))

    mesh = make_pipe_mesh(n_stages=4, n_data=2,
                          devices=jax.local_devices(backend="cpu"))
    p_sharded = shard_trunk_pipeline(p, mesh)
    got = jax.jit(lambda p, x: pipeline_transformer(
        x, p, HEADS, gelu, mesh=mesh, n_microbatches=4,
        tail_fn=tail))(p_sharded, x)
    assert got.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)

    # and it differentiates (pipelined backward through the tail)
    g = jax.jit(jax.grad(lambda p, x: jnp.sum(pipeline_transformer(
        x, p, HEADS, gelu, mesh=mesh, n_microbatches=4,
        tail_fn=tail) ** 2)))(p_sharded, x)
    gw = jax.grad(lambda p, x: jnp.sum(
        tail(transformer(x, p, HEADS, gelu)) ** 2))(p, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4), g, gw)


def test_pp_depth_not_divisible_raises():
    p = _trunk(3)
    mesh = make_pipe_mesh(n_stages=3,
                          devices=jax.local_devices(backend="cpu")[:3])
    with pytest.raises(AssertionError):
        shard_trunk_pipeline(p, mesh)
