"""Fused mini-PointNet group-encoder kernel (ops/fused_point_encoder.py):
interpret-mode numerics vs the XLA path of tokenizers.point_tokenizer_apply,
custom_vjp gradients, applicability gating, and tokenizer dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.adapters import tokenizers as tok
from vitlens_tpu.ops import fused_point_encoder as FPE


def _enc(seed=0, c4=256):
    rng = np.random.RandomState(seed)
    w = lambda a, b, s: jnp.asarray(rng.randn(a, b) * s, jnp.float32)  # noqa: E731
    v = lambda n, s: jnp.asarray(rng.randn(n) * s, jnp.float32)  # noqa: E731
    p = {
        "conv1": {"w": w(3, 128, 0.3), "b": v(128, 0.1)},
        "conv2": {"w": w(128, 256, 0.05), "b": v(256, 0.1)},
        "conv3": {"w": w(512, 512, 0.04), "b": v(512, 0.1)},
        "conv4": {"w": w(512, c4, 0.04), "b": v(c4, 0.1)},
        "bn1": {"scale": 1.0 + 0.1 * v(128, 1.0), "bias": v(128, 0.1)},
        "bn2": {"scale": 1.0 + 0.1 * v(512, 1.0), "bias": v(512, 0.1)},
    }
    s = {
        "bn1": {"mean": v(128, 0.2), "var": 1.0 + 0.5 * jnp.abs(v(128, 1.0))},
        "bn2": {"mean": v(512, 0.2), "var": 1.0 + 0.5 * jnp.abs(v(512, 1.0))},
    }
    return p, s


def _nb(b=2, g=16, m=32, seed=1, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, g, m, 3) * 0.3, dtype)


def test_kernel_matches_xla_reference(monkeypatch):
    monkeypatch.setattr(FPE, "_INTERPRET", True)
    p, s = _enc()
    nb = _nb()
    got = np.asarray(FPE.fused_point_encoder(nb, p, s), np.float32)
    want = np.asarray(FPE.xla_reference(nb, p, s), np.float32)
    assert got.shape == want.shape == (2, 16, 256)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-2  # bf16 rounding


def test_xla_reference_equals_tokenizer_path():
    """The kernel module's reference must BE the tokenizer's eval path —
    guard against numeric drift between the two copies."""
    p, s = _enc()
    nb = _nb()
    # replicate tokenizers.point_tokenizer_apply:329-351 manually
    pts_dtype = nb.dtype
    h = nb @ p["conv1"]["w"].astype(pts_dtype) + p["conv1"]["b"].astype(pts_dtype)
    h, _ = tok.batch_norm(h, p["bn1"], s["bn1"], False)
    h = jax.nn.relu(h)
    h = h @ p["conv2"]["w"].astype(pts_dtype) + p["conv2"]["b"].astype(pts_dtype)
    g = jnp.max(h, axis=2, keepdims=True)
    w3 = p["conv3"]["w"].astype(pts_dtype)
    d2 = h.shape[-1]
    h32 = (jnp.matmul(h, w3[d2:], preferred_element_type=jnp.float32)
           + jnp.matmul(g, w3[:d2], preferred_element_type=jnp.float32)
           + p["conv3"]["b"].astype(jnp.float32))
    h = h32.astype(pts_dtype)
    h, _ = tok.batch_norm(h, p["bn2"], s["bn2"], False)
    h = jax.nn.relu(h)
    h = h @ p["conv4"]["w"].astype(pts_dtype) + p["conv4"]["b"].astype(pts_dtype)
    want = np.asarray(jnp.max(h, axis=2), np.float32)
    got = np.asarray(FPE.xla_reference(nb, p, s), np.float32)
    np.testing.assert_array_equal(got, want)


def test_partial_last_tile(monkeypatch):
    """B*G not divisible by the group tile: padded groups must not corrupt
    real outputs."""
    monkeypatch.setattr(FPE, "_INTERPRET", True)
    monkeypatch.setenv("VITLENS_POINT_ENC_TG", "16")
    p, s = _enc()
    nb = _nb(b=1, g=25)  # 25 groups, tile 16 -> one partial tile
    got = np.asarray(FPE.fused_point_encoder(nb, p, s), np.float32)
    want = np.asarray(FPE.xla_reference(nb, p, s), np.float32)
    scale = np.abs(want).max()
    assert got.shape == (1, 25, 256)
    assert np.abs(got - want).max() / scale < 2e-2


def test_custom_vjp_gradients_match_xla(monkeypatch):
    monkeypatch.setattr(FPE, "_INTERPRET", True)
    p, s = _enc()
    nb = _nb(b=1, g=8, dtype=jnp.float32)  # fp32: test the formula
    op = FPE._make_op()

    def loss_fused(n, pp):
        return jnp.sum(jnp.sin(op(n.reshape(-1, *n.shape[2:]), pp, s)))

    def loss_ref(n, pp):
        return jnp.sum(jnp.sin(FPE.xla_reference(
            n.reshape(-1, *n.shape[2:]), pp, s)))

    gn_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(nb, p)
    gn_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(nb, p)
    np.testing.assert_allclose(np.asarray(gn_f), np.asarray(gn_r),
                               rtol=2e-3, atol=2e-5)
    by_path = lambda kv: str(kv[0])  # noqa: E731
    for (kf, vf), (kr, vr) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gp_f), key=by_path),
            sorted(jax.tree_util.tree_leaves_with_path(gp_r), key=by_path)):
        assert kf == kr
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=2e-3, atol=2e-5, err_msg=str(kf))


def test_applicability_gate():
    p, _ = _enc()
    ok = _nb()
    assert FPE.point_encoder_applicable(ok, p)
    assert not FPE.point_encoder_applicable(ok.astype(jnp.float32), p)
    assert not FPE.point_encoder_applicable(_nb(m=30), p)  # M % 8 != 0
    p_bad = jax.tree.map(lambda x: x, p)
    p_bad["conv4"] = {"w": jnp.zeros((512, 200), jnp.float32),
                      "b": jnp.zeros((200,), jnp.float32)}
    assert not FPE.point_encoder_applicable(ok, p_bad)  # c4 % 128 != 0


def test_tokenizer_dispatches_to_kernel(monkeypatch):
    """point_tokenizer_apply(train=False) must produce identical tokens
    through the kernel (interpret) and the XLA path."""
    from vitlens_tpu.config import make_model_config

    monkeypatch.setattr(FPE, "_INTERPRET", True)
    cfg = make_model_config("ViT-L-14", "pc").tower.point
    key = jax.random.PRNGKey(0)
    p, s = tok.point_tokenizer_init(key, cfg)
    pts = jnp.asarray(
        np.random.RandomState(0).randn(2, cfg.npoints, 3) * 0.3,
        jnp.bfloat16)

    calls = {"n": 0}
    real = FPE.fused_point_encoder

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(FPE, "fused_point_encoder", spy)
    monkeypatch.setattr(FPE, "point_encoder_available", lambda: True)
    (tk_on, pos_on), _ = tok.point_tokenizer_apply(p, s, pts, cfg)
    assert calls["n"] == 1
    monkeypatch.setattr(FPE, "point_encoder_available", lambda: False)
    (tk_off, pos_off), _ = tok.point_tokenizer_apply(p, s, pts, cfg)
    scale = np.abs(np.asarray(tk_off, np.float32)).max()
    err = np.abs(np.asarray(tk_on, np.float32)
                 - np.asarray(tk_off, np.float32)).max()
    assert err / scale < 2e-2
    np.testing.assert_array_equal(np.asarray(pos_on), np.asarray(pos_off))
