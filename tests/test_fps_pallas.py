"""Pallas FPS kernel == XLA fori_loop FPS (interpret mode on CPU; the same
kernel was verified bit-identical and ~6x faster on the real v5e)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import vitlens_tpu.ops.fps as F


def test_pallas_fps_matches_xla_interpret(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(3, 256, 3), jnp.float32)
    for start_val in [0, 17]:
        start = jnp.full((3,), start_val, jnp.int32)
        got = F._fps_indices_pallas(xyz, 64, start)
        want = F._fps_indices_xla(xyz, 64, start)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_dispatch_uses_xla_on_cpu():
    # on CPU (tests) the dispatcher must not pick the TPU kernel
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
    idx = F.fps_indices(xyz, 16)
    assert idx.shape == (2, 16)
    assert int(idx[0, 0]) == 0  # deterministic start


def test_batched_fps_matches_xla_interpret():
    """The all-batch single-invocation kernel (one [B,N] distance update per
    FPS iteration) == the XLA recurrence, incl. per-batch random starts."""
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(4, 256, 3), jnp.float32)
    for start in (jnp.zeros((4,), jnp.int32),
                  jnp.asarray([0, 5, 17, 200], jnp.int32)):
        got = F._fps_indices_pallas_batched(xyz, 32, start, interpret=True)
        want = F._fps_indices_xla(xyz, 32, start)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_padding_for_unaligned_n(monkeypatch):
    """N not divisible by 128 (e.g. vitlensG's 10000): fps_indices pads with
    copies of point 0 — a duplicate can never win the argmax tie-break, so
    indices match the unpadded XLA recurrence exactly."""
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(8, 250, 3), jnp.float32)
    start = jnp.asarray([0, 3, 100, 249, 7, 0, 11, 42], jnp.int32)
    got = F.fps_indices(xyz, 32, start=start, use_pallas=True)
    want = F._fps_indices_xla(xyz, 32, start)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(np.asarray(got).max()) < 250


def test_ball_query_approx_branch_matches_exact():
    """The TPU-default approx branch (ball_query exact=False) never runs
    under the CPU-pinned suite via the exact=None auto-gate — execute it
    explicitly. Candidate values are unique int32 indices, so at
    recall_target=1.0 approx_min_k is bit-exact vs the top_k path; the
    0.95 path must still return only in-ball (or fill) indices, ascending,
    with the same fill semantics."""
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 300, 3) * 0.3, jnp.float32)
    query = xyz[:, rng.choice(300, 64, replace=False), :]
    want = np.asarray(F.ball_query(xyz, query, 0.35, 16, exact=True))
    got = np.asarray(F.ball_query(xyz, query, 0.35, 16, exact=False,
                                  recall_target=1.0))
    np.testing.assert_array_equal(got, want)

    got95 = np.asarray(F.ball_query(xyz, query, 0.35, 16, exact=False))
    d = np.asarray(F.square_distance(query, xyz))
    in_ball = d <= 0.35 ** 2
    B, S, _ = got95.shape
    for b in range(B):
        for s_ in range(S):
            sel = got95[b, s_]
            assert ((sel >= 0) & (sel < 300)).all()
            # every selected slot is an in-ball point (fill repeats the
            # first in-ball index, which is itself in-ball); the query
            # point itself is always within its own ball
            assert in_ball[b, s_][sel].all()


def test_knn_indices_approx_branch_runs():
    """Same gap for kNN: exact=False path executed on CPU; recall 1.0 via
    a generous recall_target is not guaranteed bit-stable here, so just
    check shape/validity and high agreement with exact."""
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 200, 3), jnp.float32)
    center = xyz[:, rng.choice(200, 32, replace=False), :]
    exact = np.asarray(F.knn_indices(xyz, center, 8, exact=True))
    approx = np.asarray(F.knn_indices(xyz, center, 8, exact=False))
    assert approx.shape == exact.shape
    assert ((approx >= 0) & (approx < 200)).all()
    agree = float((np.sort(approx, -1) == np.sort(exact, -1)).mean())
    assert agree > 0.9, agree


def test_ball_query_fills_to_nsample_when_n_small():
    """nsample > N must still return nsample columns (reference
    query_ball_point always fills by repeating group_first)."""
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 12, 3) * 0.2, jnp.float32)
    out = np.asarray(F.ball_query(xyz, xyz[:, :4], 0.5, 16, exact=True))
    assert out.shape == (2, 4, 16)
    assert ((out >= 0) & (out < 12)).all()
    d = np.asarray(F.square_distance(xyz[:, :4], xyz))
    for b in range(2):
        for s_ in range(4):
            assert (d[b, s_][out[b, s_]] <= 0.5 ** 2).all()


def test_fps_indices_rejects_non_xyz_channels():
    """C != 3 would silently diverge between the XLA recurrence (all C
    channels) and the Pallas kernels (first 3) — must raise."""
    xyz6 = jnp.zeros((2, 64, 6), jnp.float32)
    with pytest.raises(ValueError, match="xyz"):
        F.fps_indices(xyz6, 8)


def test_take_points_blocked_bit_exact_vs_gather():
    # Blocked one-hot-contraction gather (the TPU default for large float
    # gathers; XLA row-gather measured 45x off bandwidth at these shapes)
    # must equal the plain gather BITWISE in every dtype, including
    # duplicate indices, N not a multiple of 128, and multi-channel points.
    rng = np.random.RandomState(0)
    for n, c, j, dt in [(8192, 3, 4096, jnp.bfloat16),
                        (8192, 3, 4096, jnp.float32),
                        (10000, 6, 2048, jnp.float32),
                        (1000, 3, 2048, jnp.bfloat16)]:
        pts = jnp.asarray(rng.randn(2, n, c), dt)
        idx = jnp.asarray(rng.randint(0, n, size=(2, j)), jnp.int32)
        idx = idx.at[:, :8].set(idx[0, 0])  # duplicates
        a = F.take_points(pts, idx, blocked=False)
        b = F.take_points(pts, idx, blocked=True)
        assert a.dtype == b.dtype == dt
        assert bool(jnp.all(a == b)), (n, c, j, dt)


def test_take_points_blocked_grad_matches_scatter():
    # AD through the blocked path is two transposed einsums (an MXU
    # scatter-add); it must agree with the gather path's XLA scatter.
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 1024, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 1024, size=(2, 2048)), jnp.int32)
    ct = jnp.asarray(rng.randn(2, 2048, 3), jnp.float32)
    g_ref = jax.vjp(lambda p: F.take_points(p, idx, blocked=False), pts)[1](ct)[0]
    g_blk = jax.vjp(lambda p: F.take_points(p, idx, blocked=True), pts)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               rtol=0, atol=1e-6)


def test_take_points_blocked_respects_idx_rank_and_int_fallback():
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(2, 2048, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 2048, size=(2, 16, 128)), jnp.int32)
    a = F.take_points(pts, idx, blocked=False)
    b = F.take_points(pts, idx, blocked=True)
    assert a.shape == b.shape == (2, 16, 128, 3)
    assert bool(jnp.all(a == b))
    # integer payloads must never take the one-hot path implicitly
    ipts = jnp.asarray(rng.randint(0, 7, size=(2, 2048, 3)), jnp.int32)
    out = F.take_points(ipts, idx)
    assert out.dtype == jnp.int32


def test_take_points_blocked_clamps_like_gather():
    """Out-of-range indices: the blocked one-hot path clamps exactly like
    XLA gather (the CPU/vmap path) instead of silently returning zero rows
    — keeps the two backends' semantics identical."""
    import numpy as np

    from vitlens_tpu.ops.fps import take_points

    pts = jnp.asarray(np.random.RandomState(0).randn(2, 1024 + 5, 3)
                      .astype(np.float32))[:, :1024]
    idx = jnp.asarray(
        np.r_[np.arange(1022), [1023, 1024, 5000, -1]][None].repeat(2, 0))
    blocked = np.asarray(take_points(pts, idx, blocked=True))
    gathered = np.asarray(take_points(pts, idx, blocked=False))
    np.testing.assert_array_equal(blocked, gathered)
    # the out-of-range rows really clamped to the last row, not zero
    np.testing.assert_array_equal(blocked[:, -2], np.asarray(pts[:, -1]))
