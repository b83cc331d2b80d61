"""Loss parity vs reference loss.py (world_size=1 oracle) and multi-device
equivalence of the gathered/sharded variants on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vitlens_tpu.train import losses as L
from tests import ref_oracle


def _feats(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def ref_loss():
    return ref_oracle.load("open_clip.loss")


def test_clip_loss_matches_reference(ref_loss):
    import torch

    rng = np.random.RandomState(0)
    x, y = _feats(rng, 8, 16), _feats(rng, 8, 16)
    scale = 50.0
    ref = ref_loss.ClipLossGeneral()(
        torch.from_numpy(x), torch.from_numpy(y), torch.tensor(scale)
    ).item()
    ours = float(L.clip_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(scale)))
    assert abs(ours - ref) < 1e-5


def test_tri_clip_loss_matches_reference(ref_loss):
    import torch

    rng = np.random.RandomState(1)
    i, t, v = _feats(rng, 8, 16), _feats(rng, 8, 16), _feats(rng, 8, 16)
    scale = 30.0
    ref = ref_loss.TriClipLoss()(
        torch.from_numpy(i), torch.from_numpy(t), torch.from_numpy(v),
        torch.tensor(scale),
    ).item()
    ours = float(
        L.tri_clip_loss(jnp.asarray(i), jnp.asarray(t), jnp.asarray(v),
                        jnp.asarray(scale))
    )
    assert abs(ours - ref) < 1e-5


def test_sim_mask_loss_matches_reference(ref_loss):
    import torch

    rng = np.random.RandomState(2)
    x, y = _feats(rng, 8, 16), _feats(rng, 8, 16)
    # make some x's nearly identical so the mask bites
    x[3] = x[0] + 1e-4
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    scale = 20.0
    ref = ref_loss.ClipLossSimMask(sim_thres=0.9)(
        torch.from_numpy(x), torch.from_numpy(y), torch.tensor(scale)
    ).item()
    mask = L.sim_mask(jnp.asarray(x), 0.9)
    ours = float(
        L.clip_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(scale), mask=mask)
    )
    assert abs(ours - ref) < 1e-5


def test_label_mask_loss_matches_reference(ref_loss):
    import torch

    rng = np.random.RandomState(3)
    x, y = _feats(rng, 8, 16), _feats(rng, 8, 16)
    labels = np.array([0, 1, 0, 2, 3, 1, 4, 5])
    scale = 20.0
    ref = ref_loss.ClipLossLabelMask(use_mask=True)(
        torch.from_numpy(x), torch.from_numpy(y), torch.tensor(scale),
        x_labels=torch.from_numpy(labels), y_labels=torch.from_numpy(labels),
    ).item()
    mask = L.label_mask(jnp.asarray(labels), jnp.asarray(labels))
    ours = float(
        L.clip_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(scale), mask=mask)
    )
    assert abs(ours - ref) < 1e-5


def _cpu_mesh(n=4):
    devs = jax.local_devices(backend="cpu")[:n]
    return Mesh(np.array(devs), ("data",))


def test_gathered_tri_loss_matches_global():
    """shard_map tri loss over 4 virtual devices == single-device global."""
    rng = np.random.RandomState(4)
    i, t, v = _feats(rng, 16, 8), _feats(rng, 16, 8), _feats(rng, 16, 8)
    scale = jnp.asarray(25.0)
    want = L.tri_clip_loss(jnp.asarray(i), jnp.asarray(t), jnp.asarray(v), scale)

    mesh = _cpu_mesh(4)

    @jax.jit
    def run(i, t, v):
        def f(i, t, v):
            loss = L.tri_clip_loss(i, t, v, scale, axis_name="data")
            return jax.lax.pmean(loss, "data")  # value already equal on shards

        return shard_map(
            f, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P(),  # same loss value on every shard
        )(i, t, v)

    got = run(jnp.asarray(i), jnp.asarray(t), jnp.asarray(v))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_local_loss_matches_global():
    """local-loss (rank-offset labels, [b, B_global] logits) must equal the
    full-matrix loss when losses are averaged over shards (reference
    loss.py:107-133 semantics)."""
    rng = np.random.RandomState(5)
    x, y = _feats(rng, 16, 8), _feats(rng, 16, 8)
    scale = jnp.asarray(25.0)
    want = L.clip_loss(jnp.asarray(x), jnp.asarray(y), scale)

    mesh = _cpu_mesh(4)

    @jax.jit
    def run(x, y):
        def f(x, y):
            loss = L.clip_loss(x, y, scale, axis_name="data", local_loss=True)
            return jax.lax.pmean(loss, "data")

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )(x, y)

    got = run(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_local_loss_with_mask_matches_global():
    rng = np.random.RandomState(6)
    x, y = _feats(rng, 16, 8), _feats(rng, 16, 8)
    labels = np.arange(16) % 5
    scale = jnp.asarray(25.0)
    gmask = L.label_mask(jnp.asarray(labels), jnp.asarray(labels))
    want = L.clip_loss(jnp.asarray(x), jnp.asarray(y), scale, mask=gmask)

    mesh = _cpu_mesh(4)

    @jax.jit
    def run(x, y, lab):
        def f(x, y, lab):
            m = L.label_mask(lab, lab, axis_name="data")
            loss = L.clip_loss(x, y, scale, axis_name="data",
                               local_loss=True, mask=m)
            return jax.lax.pmean(loss, "data")

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P()
        )(x, y, lab)

    got = run(jnp.asarray(x), jnp.asarray(y), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_distill_token_loss_matches_reference(ref_loss):
    import torch

    rng = np.random.RandomState(7)
    v = rng.randn(4, 10, 8).astype(np.float32)
    t = rng.randn(4, 10, 8).astype(np.float32)
    crit = ref_loss.TriClipDistillTokenLoss(loss_type="mse")
    ref = crit.distill_token_loss(torch.from_numpy(v), torch.from_numpy(t)).item()
    ours = float(L.distill_token_loss(jnp.asarray(v), jnp.asarray(t), "mse"))
    assert abs(ours - ref) < 1e-6

    crit = ref_loss.TriClipDistillTokenLoss(loss_type="cos")
    ref = crit.distill_token_loss(torch.from_numpy(v), torch.from_numpy(t)).item()
    ours = float(L.distill_token_loss(jnp.asarray(v), jnp.asarray(t), "cos"))
    assert abs(ours - ref) < 1e-6


def test_make_loss_fn_validation():
    """Misconfigurations raise instead of silently training a different
    objective (reference create_loss raises on unknown types too,
    factory.py:819-820)."""
    with pytest.raises(ValueError, match="unknown contra_loss_type"):
        L.make_loss_fn(3, "typo_mask")
    # distill_token is tri-SHAPED, not tri-only: the video-distill forward
    # emits all tri keys for any n_tower (tri_forward_video_distill), so
    # the factory must hand back the tri branch even at n_tower=2 — the
    # dual+distill misconfig (no video_distill) is rejected by
    # StepConfig.__post_init__ instead, where video_distill is known
    fn2 = L.make_loss_fn(2, "distill_token")

    def _l2(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    tri_out = {
        "image_features": _l2(jnp.ones((2, 4))),
        "text_features": _l2(jnp.arange(8.0).reshape(2, 4)),
        "visual_features": _l2(jnp.ones((2, 4)) * 0.5),
        "visual_tokens": jnp.ones((2, 3, 4)),
        "image_tokens": jnp.ones((2, 3, 4)) * 0.9,
        "logit_scale": jnp.asarray(10.0),
    }
    assert np.isfinite(float(fn2(tri_out)))
    from vitlens_tpu.train.step import StepConfig
    with pytest.raises(ValueError, match="video-distill"):
        StepConfig(n_tower=2, contra_loss_type="distill_token",
                   video_distill=False)
    # n_tower=3 without video_distill is ALSO invalid: the plain tri
    # forward emits features only, never visual_tokens/image_tokens
    # (advisor r4) — must fail at construction, not KeyError mid-trace
    with pytest.raises(ValueError, match="video-distill"):
        StepConfig(n_tower=3, contra_loss_type="distill_token",
                   video_distill=False)
    # ...and the combination cli/train.py anticipates constructs fine
    StepConfig(n_tower=2, contra_loss_type="distill_token",
               video_distill=True)
    # a dual forward missing the anchor key names the problem, not a
    # NoneType crash deep inside tracing
    fn = L.make_loss_fn(2, "general")
    out = {"visual_features": jnp.ones((2, 4)),
           "logit_scale": jnp.asarray(10.0)}
    with pytest.raises(KeyError):
        fn(out)
