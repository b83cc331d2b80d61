"""Fused residual-MLP Pallas kernel (ops/fused_mlp.py): interpret-mode
numerics vs the XLA reference, custom_vjp gradients, resblock dispatch
gating, and the erf approximation itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.ops import fused_mlp as FM


def _args(m=256, d=128, hidden=256, seed=0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(m, d) * 0.5, dtype),
        jnp.asarray(rng.rand(1, d) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(1, d) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(d, hidden) * 0.05, dtype),
        jnp.asarray(rng.randn(1, hidden) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(hidden, d) * 0.05, dtype),
        jnp.asarray(rng.randn(1, d) * 0.1, jnp.float32),
    )


def test_erf_approx_matches_exact():
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    got = np.asarray(FM._gelu_erf_approx(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - want).max() < 1e-6


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_kernel_matches_xla_reference(act, monkeypatch):
    monkeypatch.setattr(FM, "_INTERPRET", True)
    args = _args()
    got = np.asarray(
        FM._pallas_fused_mlp(*args, act=act, eps=1e-5, tm=128), np.float32)
    want = np.asarray(
        FM._xla_reference(*args, act=act, eps=1e-5), np.float32)
    scale = max(1e-6, np.abs(want).max())
    assert np.abs(got - want).max() / scale < 2.5e-2  # bf16 rounding; the
    # kernel keeps h in fp32 through the act where XLA rounds it to bf16


def test_kernel_partial_last_tile(monkeypatch):
    """M not divisible by the tile: padded rows must not corrupt real ones."""
    monkeypatch.setattr(FM, "_INTERPRET", True)
    args = _args(m=200)
    got = np.asarray(
        FM._pallas_fused_mlp(*args, act="gelu", eps=1e-5, tm=128), np.float32)
    want = np.asarray(
        FM._xla_reference(*args, act="gelu", eps=1e-5), np.float32)
    scale = np.abs(want).max()
    assert got.shape == (200, 128)
    assert np.abs(got - want).max() / scale < 2.5e-2


def test_custom_vjp_gradients_match_xla(monkeypatch):
    monkeypatch.setattr(FM, "_INTERPRET", True)
    args = _args(m=64, d=128, hidden=128, dtype=jnp.float32)
    # fp32 so finite-precision effects don't mask a wrong formula
    op = FM._make_op("gelu", 1e-5)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(op(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(FM._xla_reference(*a, act="gelu", eps=1e-5)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 4, 5, 6))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 4, 5, 6))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-5)


def test_resblock_dispatch_gating():
    """fused path requires: TPU backend, bf16, big M, aligned dims, no
    layer-scale."""
    from vitlens_tpu.models import layers as L

    p = L.resblock_init(jax.random.PRNGKey(0), 128)
    x_ok = jnp.zeros((64, 128, 128), jnp.bfloat16)  # rows = 8192
    assert FM.fused_mlp_applicable(x_ok, p, "gelu")
    assert not FM.fused_mlp_applicable(x_ok, p, "relu")
    assert not FM.fused_mlp_applicable(
        x_ok.astype(jnp.float32), p, "gelu")
    assert not FM.fused_mlp_applicable(
        jnp.zeros((4, 16, 128), jnp.bfloat16), p, "gelu")  # too few rows
    p_ls = L.resblock_init(jax.random.PRNGKey(0), 128, ls_init_value=0.1)
    assert not FM.fused_mlp_applicable(x_ok, p_ls, "gelu")
    # bigG-scale weights (D=1664, H=8192 -> 54.5 MB) stay applicable (the
    # kernel clamps tm to 256 so the scoped-VMEM budget holds — the tm=512
    # tile compile-OOM'd at B32); anything past 56 MB must refuse
    p_big = L.resblock_init(jax.random.PRNGKey(1), 1664, mlp_ratio=8192/1664)
    x_big = jnp.zeros((32, 257, 1664), jnp.bfloat16)
    assert FM.fused_mlp_applicable(x_big, p_big, "gelu")
    p_huge = L.resblock_init(jax.random.PRNGKey(2), 2048, mlp_ratio=4.0)
    x_huge = jnp.zeros((32, 257, 2048), jnp.bfloat16)
    assert not FM.fused_mlp_applicable(x_huge, p_huge, "gelu")
    # CPU-pinned tests must never take the kernel path
    assert not FM.fused_mlp_available()


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("VITLENS_DISABLE_FUSED_MLP", "1")
    monkeypatch.setattr(
        "vitlens_tpu.ops.platform.is_tpu_default", lambda: True)
    assert not FM.fused_mlp_available()
    monkeypatch.delenv("VITLENS_DISABLE_FUSED_MLP")
    assert FM.fused_mlp_available()


def test_fused_block_equals_resblock_mlp_half(monkeypatch):
    """fused_mlp_block on [B,N,D] == the resblock's ln_2/mlp half."""
    from vitlens_tpu.models import layers as L

    monkeypatch.setattr(FM, "_INTERPRET", True)
    p = L.resblock_init(jax.random.PRNGKey(1), 128)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 128) * 0.3, jnp.bfloat16)

    got = np.asarray(FM.fused_mlp_block(x, p, "gelu"), np.float32)
    h = L.linear(L.layer_norm(x, p["ln_2"]), p["mlp"]["fc"])
    want = np.asarray(x + L.linear(L.gelu(h), p["mlp"]["proj"]), np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2.5e-2


def test_programmatic_tp_kill_switch(monkeypatch):
    """TP placement must disable the kernel without relying on the env var
    (GSPMD cannot shard through the opaque custom call)."""
    monkeypatch.setattr(
        "vitlens_tpu.ops.platform.is_tpu_default", lambda: True)
    monkeypatch.delenv("VITLENS_DISABLE_FUSED_MLP", raising=False)
    assert FM.fused_mlp_available()
    FM.set_fused_mlp_enabled(False)
    assert not FM.fused_mlp_available()
    FM.set_fused_mlp_enabled(True)
    assert FM.fused_mlp_available()

    # both TP placement entry points flip the switch
    import numpy as np_

    import jax

    from vitlens_tpu.models import layers as L
    from vitlens_tpu.parallel.mesh import make_mesh
    from vitlens_tpu.parallel.tp import shard_vision_tower

    from vitlens_tpu.models.vit import vision_tower_init
    from vitlens_tpu.config import TowerConfig, VisionArch

    arch = VisionArch(image_size=28, patch_size=14, width=32, layers=1,
                      head_width=16)
    tower = TowerConfig(arch=arch, embed_dim=16, modality="image")
    params, _ = vision_tower_init(jax.random.PRNGKey(0), tower)
    mesh = make_mesh(n_data=2, n_model=4,
                     devices=jax.local_devices(backend="cpu")[:8])
    shard_vision_tower(params, mesh)
    assert not FM.fused_mlp_available()
