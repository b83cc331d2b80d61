"""Fused LN+projection Pallas kernel (ops/fused_ln_proj.py): interpret-mode
numerics vs the XLA reference, custom_vjp gradients, resblock dispatch
gating, and equality with the resblock's ln_1+qkv front half."""

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.ops import fused_ln_proj as FL


def _args(m=256, d=128, out=384, seed=0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(m, d) * 0.5, dtype),
        jnp.asarray(rng.rand(1, d) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(1, d) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(d, out) * 0.05, dtype),
        jnp.asarray(rng.randn(1, out) * 0.1, jnp.float32),
    )


def test_kernel_matches_xla_reference(monkeypatch):
    monkeypatch.setattr(FL, "_INTERPRET", True)
    args = _args()
    got = np.asarray(FL._pallas_ln_proj(*args, eps=1e-5, tm=128), np.float32)
    want = np.asarray(FL._xla_reference(*args, eps=1e-5), np.float32)
    scale = max(1e-6, np.abs(want).max())
    assert np.abs(got - want).max() / scale < 2.5e-2


def test_kernel_partial_last_tile(monkeypatch):
    """M not divisible by the tile: padded rows must not corrupt real ones."""
    monkeypatch.setattr(FL, "_INTERPRET", True)
    args = _args(m=200)
    got = np.asarray(FL._pallas_ln_proj(*args, eps=1e-5, tm=128), np.float32)
    want = np.asarray(FL._xla_reference(*args, eps=1e-5), np.float32)
    assert got.shape == (200, 384)
    assert np.abs(got - want).max() / np.abs(want).max() < 2.5e-2


def test_custom_vjp_gradients_match_xla(monkeypatch):
    monkeypatch.setattr(FL, "_INTERPRET", True)
    # fp32 so finite-precision effects don't mask a wrong formula
    args = _args(m=64, d=128, out=128, dtype=jnp.float32)
    op = FL._make_op(1e-5)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(op(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(FL._xla_reference(*a, eps=1e-5)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-5)


def test_dispatch_gating():
    w = jnp.zeros((128, 384), jnp.bfloat16)
    x_ok = jnp.zeros((64, 128, 128), jnp.bfloat16)  # rows = 8192
    assert FL.fused_ln_proj_applicable(x_ok, w)
    assert not FL.fused_ln_proj_applicable(x_ok.astype(jnp.float32), w)
    assert not FL.fused_ln_proj_applicable(
        jnp.zeros((4, 16, 128), jnp.bfloat16), w)  # too few rows
    assert not FL.fused_ln_proj_applicable(
        jnp.zeros((64, 128, 100), jnp.bfloat16), jnp.zeros((100, 300)))
    # CPU-pinned tests must never take the kernel path
    assert not FL.fused_ln_proj_available()


def test_env_opt_in(monkeypatch):
    """The op is opt-in (measured e2e loss at the flagship shape): off by
    default even where the flash kernel is available."""
    monkeypatch.setattr(
        "vitlens_tpu.ops.platform.is_tpu_default", lambda: True)
    monkeypatch.delenv("VITLENS_ENABLE_FUSED_LNQKV", raising=False)
    assert not FL.fused_ln_proj_available()
    monkeypatch.setenv("VITLENS_ENABLE_FUSED_LNQKV", "1")
    assert FL.fused_ln_proj_available()


def test_fused_equals_resblock_front_half(monkeypatch):
    """fused_ln_qkv on [B,N,D] == layer_norm + the packed qkv projection."""
    from vitlens_tpu.models import layers as L

    monkeypatch.setattr(FL, "_INTERPRET", True)
    p = L.resblock_init(jax.random.PRNGKey(1), 128)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 128) * 0.3, jnp.bfloat16)

    got = np.asarray(FL.fused_ln_qkv(x, p["ln_1"], p["attn"]), np.float32)
    y = L.layer_norm(x, p["ln_1"])
    want = np.asarray(
        y @ p["attn"]["qkv_w"].astype(y.dtype)
        + p["attn"]["qkv_b"].astype(y.dtype), np.float32)
    scale = np.abs(want).max()
    assert got.shape == (2, 64, 384)
    assert np.abs(got - want).max() / scale < 2.5e-2


def test_resblock_uses_fused_front_half(monkeypatch):
    """With availability forced on + interpret mode, the full resblock output
    through the fused front half matches the plain path."""
    from vitlens_tpu.models import layers as L

    p = L.resblock_init(jax.random.PRNGKey(3), 128)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(64, 128, 128) * 0.3, jnp.bfloat16)

    want = np.asarray(L.resblock(x, p, heads=4, act=L.gelu), np.float32)
    monkeypatch.setattr(FL, "_INTERPRET", True)
    monkeypatch.setattr(L, "fused_ln_proj_available", lambda: True)
    got = np.asarray(L.resblock(x, p, heads=4, act=L.gelu), np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2.5e-2
