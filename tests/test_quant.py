"""int8 (W8A8) post-training quantization (vitlens_tpu/quant.py).

The on-chip measurements (scripts/bench_int8_encode.py,
scripts/bench_int8_native.py, 2026-08-19) recorded the serving verdict:
this chip's MXU runs int8 dots at bf16 rate (231 vs 230 TOP/s — no 2x),
so W8A8 is 0.904x e2e and stays an opt-in library feature. These tests
keep its NUMERICS correct: the quantized path is exact-int8 under the
hood and feature fidelity holds at trunk depth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.quant import (
    int8_matmul,
    is_quantized,
    quantize_model,
    quantize_resblocks,
    quantize_tower_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip_bound():
    w = jnp.asarray(np.random.RandomState(0).randn(64, 48) * 0.1)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and q.shape == w.shape
    assert s.shape == (1, 48)
    deq = q.astype(jnp.float32) * s
    # symmetric rounding: at most half a step per element, per channel
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s) / 2 + 1e-9).all()
    # every channel actually uses the full range
    assert int(jnp.max(jnp.abs(q))) == 127


def test_quantize_weight_stacked_layers():
    w = jnp.asarray(np.random.RandomState(1).randn(3, 32, 16))
    q, s = quantize_weight(w)
    assert q.shape == (3, 32, 16) and s.shape == (3, 1, 16)
    # per-layer == stacked
    q0, s0 = quantize_weight(w[1])
    np.testing.assert_array_equal(np.asarray(q[1]), np.asarray(q0))
    np.testing.assert_allclose(np.asarray(s[1]), np.asarray(s0))


def test_int8_matmul_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(17, 96), jnp.float32)
    w = jnp.asarray(rng.randn(96, 40) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(40), jnp.float32)
    wq, ws = quantize_weight(w)
    got = np.asarray(int8_matmul(x, wq, ws, b))

    x32 = np.asarray(x)
    xs = np.maximum(np.abs(x32).max(-1, keepdims=True) / 127.0, 1e-12)
    xi = np.clip(np.round(x32 / xs), -127, 127).astype(np.int64)
    acc = xi @ np.asarray(wq, np.int64)
    want = acc * xs * np.asarray(ws) + np.asarray(b)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                               atol=1e-5)
    # and it is actually close to the float matmul
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999


def test_int8_matmul_batched_rank3():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 24) * 0.1, jnp.float32)
    wq, ws = quantize_weight(w)
    y = int8_matmul(x, wq, ws)
    assert y.shape == (2, 5, 24) and y.dtype == x.dtype
    flat = int8_matmul(x.reshape(10, 32), wq, ws)
    np.testing.assert_allclose(np.asarray(y).reshape(10, 24),
                               np.asarray(flat), rtol=1e-6)


def test_quantized_resblock_runs_and_tracks_float():
    from vitlens_tpu.models import layers as L

    p = L.resblock_init(jax.random.PRNGKey(0), 64)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 9, 64) * 0.3,
                    jnp.float32)
    ref = np.asarray(L.resblock(x, p, heads=4, act=L.gelu))
    pq = quantize_resblocks(p)
    assert "qkv_w" not in pq["attn"] and "qkv_w_q" in pq["attn"]
    got = np.asarray(L.resblock(x, pq, heads=4, act=L.gelu))
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999


def test_quantize_model_tower_fidelity():
    from vitlens_tpu import create_model

    m = create_model("ViT-Tiny-Test", "audio", seed=0)
    x = np.random.RandomState(5).randn(2, 512, 128).astype(np.float32)
    f0 = np.asarray(m.encode_visual(x, normalize=True), np.float32)
    mq = quantize_model(m, towers=("visual", "text"))
    assert is_quantized(mq.params["visual"])
    assert not is_quantized(m.params["visual"])  # original untouched
    f1 = np.asarray(mq.encode_visual(x, normalize=True), np.float32)
    assert ((f0 * f1).sum(-1)).min() > 0.99

    t = np.zeros((3, 77), np.int32)
    t[:, 0], t[:, 1], t[:, 2] = 49406, 320, 49407
    t0 = np.asarray(m.encode_text(t, normalize=True), np.float32)
    t1 = np.asarray(mq.encode_text(t, normalize=True), np.float32)
    assert ((t0 * t1).sum(-1)).min() > 0.99


def test_quantize_rejects_lora():
    with pytest.raises(ValueError, match="LoRA"):
        quantize_tower_params({"lora": {}, "trunk": {"blocks": {}}})


def test_quantized_encode_shards_over_data_mesh():
    """int8 params ride jax.sharding like any pytree: a data-parallel mesh
    encode (weights replicated, batch sharded) reproduces the single-device
    quantized embeddings — the serving `mesh=` mode stays available if a
    deployment opts into quantization."""
    import numpy as np_
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vitlens_tpu import create_model
    from vitlens_tpu.models import tri

    m = create_model("ViT-Tiny-Test", "audio", seed=0)
    mq = quantize_model(m)
    x = jnp.asarray(
        np_.random.RandomState(7).randn(8, 512, 128), jnp.float32)
    want = np_.asarray(mq.encode_visual(x, normalize=True), np_.float32)

    cpus = jax.local_devices(backend="cpu")[:4]
    mesh = Mesh(np_.asarray(cpus), ("data",))
    repl = NamedSharding(mesh, P())
    cfg = mq.cfg

    @jax.jit
    def enc(p, s, xx):
        f, _ = tri.encode_visual(p, s, xx, cfg, normalize=True,
                                 compute_dtype=jnp.float32)
        return f

    p = jax.device_put(mq.params, repl)
    s = jax.device_put(mq.state, repl)
    xx = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np_.asarray(enc(p, s, xx), np_.float32)
    np_.testing.assert_allclose(got, want, atol=2e-6)


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """Quantize-once-serve-forever: int8 leaves and scales survive the
    orbax checkpoint exactly (a deployment quantizes at export time and
    loads the int8 tree directly)."""
    from vitlens_tpu import create_model
    from vitlens_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    m = create_model("ViT-Tiny-Test", "audio", seed=0)
    mq = quantize_model(m)
    path = save_checkpoint(str(tmp_path), {"params": mq.params}, epoch=0)
    loaded = load_checkpoint(path, {"params": mq.params})["params"]
    blocks = loaded["visual"]["trunk"]["blocks"]
    assert blocks["attn"]["qkv_w_q"].dtype == jnp.int8
    for a, b in zip(jax.tree.leaves(mq.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
