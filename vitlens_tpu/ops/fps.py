"""Farthest-point sampling and kNN grouping on TPU.

Replaces the reference's CUDA/dgl FPS and pure-torch fallbacks
(/root/reference/vitlens/src/open_clip/modal_3d/models/pointbert/misc.py:48-68,
modal_3d/processors/pc_processor.py:8-29, pointnet/pointnet_util.py:74-123).

FPS is inherently a sequential argmax recurrence; on TPU we run it as a
`lax.fori_loop` keeping the running min-distance vector live in registers/VMEM
— O(npoint * N) elementwise work, bandwidth-bound and small next to the model
forward. kNN is a batched pairwise-sqdist matmul (MXU) + `lax.top_k`.

All functions are jit-able with static shapes and take an explicit start
index / PRNG key so the stochastic reference behaviour (random FPS start,
misc.py:60) has a deterministic, testable variant.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance. src [..., N, C], dst [..., M, C]
    -> [..., N, M]. Matmul formulation keeps the work on the MXU
    (reference: dvae.py:121-140)."""
    d = -2.0 * jnp.einsum("...nc,...mc->...nm", src, dst)
    d = d + jnp.sum(src * src, axis=-1)[..., :, None]
    d = d + jnp.sum(dst * dst, axis=-1)[..., None, :]
    return d


def fps_indices(
    xyz: jnp.ndarray,
    npoint: int,
    start: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched farthest-point sampling indices.

    Args:
      xyz: [B, N, 3]
      npoint: number of samples (static)
      start: optional [B] int32 start indices; default 0 (deterministic)
      key: optional PRNG key -> random start like the reference (misc.py:60)
    Returns [B, npoint] int32 indices.

    On TPU the sequential argmax recurrence runs as a single Pallas kernel
    with the running min-distance vector resident in VMEM (measured ~20x
    faster than the lax.fori_loop lowering, which round-trips HBM and pays
    per-iteration overheads x npoint).
    """
    B, N, C = xyz.shape
    if C != 3:
        # LOUD: the XLA recurrence would use all C channels while the
        # Pallas kernels read only the first 3 — a C>3 caller would get
        # silently different selections on CPU vs TPU. Reference FPS is
        # xyz-only (pointnet2_utils.furthest_point_sample); slice first.
        raise ValueError(
            f"fps_indices expects xyz [B, N, 3]; got {xyz.shape} — pass "
            "coordinates only (xyz[..., :3])")
    if start is None:
        if key is not None:
            start = jax.random.randint(key, (B,), 0, N)
        else:
            start = jnp.zeros((B,), dtype=jnp.int32)
    start = start.astype(jnp.int32)
    xyz = xyz.astype(jnp.float32)

    if use_pallas is None:
        from vitlens_tpu.ops.platform import is_tpu_default

        use_pallas = is_tpu_default()
    if use_pallas:
        if N % 128 != 0:
            # pad to the lane width with copies of point 0: a duplicate has
            # exactly point 0's distance-to-selected-set, and the argmax
            # tie-break (min index among maxima) always prefers the original
            # — so a padded index can never be emitted (tested vs the
            # unpadded recurrence). Makes the kernel serve N=10000
            # (vitlensG) instead of falling back to the slow XLA loop.
            pad = (-N) % 128
            xyz = jnp.concatenate(
                [xyz, jnp.broadcast_to(xyz[:, :1], (B, pad, 3))], axis=1)
        # all-batch kernel when everything fits VMEM comfortably: persistent
        # state is 16 B/point (xyz + dist scratch) but the loop body's
        # temporaries (iota/sel/d) roughly double live VMEM, so gate with
        # 2.5x headroom against the 64 MB cap. Measured 7.9x over the
        # per-batch grid kernel at B=64, N=8192 (the grid serializes on the
        # single TensorCore).
        if B % 8 == 0 and 16 * B * xyz.shape[1] <= 24 * 1024 * 1024:
            return _fps_indices_pallas_batched(xyz, npoint, start)
        return _fps_indices_pallas(xyz, npoint, start)
    return _fps_indices_xla(xyz, npoint, start)


def _fps_indices_xla(xyz, npoint: int, start) -> jnp.ndarray:
    B, N, _ = xyz.shape
    dist0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)

    def body(i, carry):
        dist, farthest, idxs = carry
        idxs = idxs.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum(jnp.square(xyz - centroid), axis=-1)  # [B,N]
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, idxs

    _, _, idxs = jax.lax.fori_loop(0, npoint, body, (dist0, start, idxs0))
    return idxs


def _fps_indices_pallas_batched(xyz, npoint: int, start,
                                interpret: bool = False) -> jnp.ndarray:
    """All-batch FPS in ONE kernel invocation: each of the npoint iterations
    updates the [B, N] running min-distance matrix for every batch element
    at once (VMEM-resident; B=64, N=8192 -> 2 MB), instead of the per-batch
    grid of `_fps_indices_pallas` whose grid steps serialize on the single
    TensorCore. The per-iteration argmax/centroid math is the same masked
    (lane-dynamic-free) formulation. Indices are stored iteration-major
    ([npoint, B], dynamic SUBLANE offset — supported by Mosaic, unlike
    dynamic lane offsets) and transposed on the way out."""
    B, N, _ = xyz.shape
    xyz_t = xyz.transpose(2, 0, 1)  # [3, B, N]

    def kernel(xyz_ref, start_ref, idx_ref, dist_ref):
        xs = xyz_ref[0]
        ys = xyz_ref[1]
        zs = xyz_ref[2]
        dist_ref[...] = jnp.full((B, N), 1e10, jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

        def body(i, farthest):  # farthest [B, 1] int32
            idx_ref[pl.ds(i, 1), :] = farthest.reshape(1, B)
            sel = (col == farthest).astype(jnp.float32)
            cx = jnp.sum(xs * sel, axis=1, keepdims=True)
            cy = jnp.sum(ys * sel, axis=1, keepdims=True)
            cz = jnp.sum(zs * sel, axis=1, keepdims=True)
            d = (jnp.square(xs - cx) + jnp.square(ys - cy)
                 + jnp.square(zs - cz))
            dist = jnp.minimum(dist_ref[...], d)
            dist_ref[...] = dist
            m = jnp.max(dist, axis=1, keepdims=True)
            return jnp.min(jnp.where(dist == m, col, N), axis=1,
                           keepdims=True).astype(jnp.int32)

        jax.lax.fori_loop(0, npoint, body, start_ref[...].reshape(B, 1))

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((3, B, N), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((npoint, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xyz_t, start.reshape(B, 1))
    return out.T


def _fps_indices_pallas(xyz, npoint: int, start) -> jnp.ndarray:
    B, N, _ = xyz.shape
    xyz_t = xyz.transpose(0, 2, 1)  # [B, 3, N]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, 3, N), lambda b, s_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, npoint), lambda b, s_ref: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
    )

    def kernel(start_all_ref, xyz_ref, idx_ref, dist_ref):
        b = pl.program_id(0)
        _fps_kernel_body(start_all_ref[b], xyz_ref, idx_ref, dist_ref,
                         npoint=npoint)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        grid_spec=grid_spec,
    )(start, xyz_t)
    return out[:, 0, :]


def _fps_kernel_body(start, xyz_ref, idx_ref, dist_ref, *, npoint: int):
    N = xyz_ref.shape[1]
    dist_ref[...] = jnp.full((1, N), 1e10, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    xs = xyz_ref[0:1, :]
    ys = xyz_ref[1:2, :]
    zs = xyz_ref[2:3, :]

    def body(i, farthest):
        idx_ref[0, i] = farthest  # SMEM scalar store (dynamic lane offsets
        # are not supported for VMEM vector stores)
        # centroid coords via masked reduction — Mosaic cannot lower
        # arbitrary dynamic lane offsets, so select-and-sum instead
        sel = (col == farthest).astype(jnp.float32)
        cx = jnp.sum(xs * sel)
        cy = jnp.sum(ys * sel)
        cz = jnp.sum(zs * sel)
        d = (jnp.square(xs - cx) + jnp.square(ys - cy) + jnp.square(zs - cz))
        dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = dist
        m = jnp.max(dist)
        return jnp.min(jnp.where(dist == m, col, N)).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start.astype(jnp.int32))


def fps(
    xyz: jnp.ndarray,
    npoint: int,
    start: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """FPS returning the sampled points [B, npoint, C] (extra channels ride
    along with the xyz used for distances, like the reference eval processor
    pc_processor.py:8-29)."""
    idx = fps_indices(xyz[..., :3], npoint, start=start, key=key)
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)


def knn_indices(xyz: jnp.ndarray, query: jnp.ndarray, k: int,
                exact: Optional[bool] = None,
                recall_target: float = 0.95) -> jnp.ndarray:
    """k nearest neighbours of each query point. xyz [B,N,C], query [B,S,C]
    -> [B,S,k] int32 (reference: dvae.py:107-118 knn_point).

    On TPU the default uses `lax.approx_min_k` (the TPU-native partial
    selection). recall_target is a cliff, not a dial: at the flagship shape
    (B=64, S=512, N=8192, k=32) 0.95 and 0.97 both select the cheap
    aggregation config — 9.8 ms with ACTUAL neighbour recall 0.9875 vs
    exact — while 0.99 forces the expensive one (63 ms, recall 0.9973),
    6.4x slower for +1% recall. The swapped neighbours are themselves
    near-neighbours and the group features are max-pooled: tower features
    agree with exact kNN to cosine >= 0.9999. Pass exact=True for
    bit-parity with the reference."""
    d = square_distance(query, xyz)  # [B, S, N]
    if exact is None:
        from vitlens_tpu.ops.platform import is_tpu_default

        exact = not is_tpu_default()
    if exact:
        _, idx = jax.lax.top_k(-d, k)
    else:
        _, idx = jax.lax.approx_min_k(d, k, recall_target=recall_target)
    return idx.astype(jnp.int32)


def _take_points_blocked(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact row gather as a two-stage one-hot contraction.

    XLA's TPU gather lowers row-by-row: at the flagship grouping shape
    (B=64, N=8192, J=G*M=16384) it runs ~15 ms ≈ 45x below HBM bandwidth,
    and the cost is independent of row width — 3-wide, 128-padded and
    projected-row variants all measure ~15 ms (scripts/
    bench_gather_variants.py). Reformulated, a gather is two selections:
    split idx into (hi, lo) = (idx // 128, idx % 128), view points as
    lane-tiled blocks xb [B, NB, 128, C], then
      lane select    r[j, k, :] = xb[k, lo_j, :]   — one-hot [J,128] matmul
                                                     on the MXU (K=128),
      sublane select out[j, :]  = r[j, hi_j, :]    — masked reduce over the
                                                     NB block rows.
    Both one-hots fuse into their consumers (never hit HBM) and the only
    intermediate is r [B, J, NB, C]. Selection by an exact 1.0 one-hot is
    bit-exact in every dtype (single nonzero term per sum) — PROVIDED the
    operands are not rounded first: TPU default matmul precision truncates
    fp32 operands to bf16 on the MXU, so both einsums pin
    precision=HIGHEST (fp32 payloads multiply in full precision; bf16
    payloads are unaffected, so the flagship bf16 paths keep the fast
    single-pass MXU form). Caveat: a non-finite value anywhere in a
    gathered lane-block poisons the selection (0 * inf = nan); point
    coordinates are finite.
    """
    B, N, C = points.shape
    J = idx.shape[1]
    nb = -(-N // 128)
    if nb * 128 != N:
        points = jnp.pad(points, ((0, 0), (0, nb * 128 - N), (0, 0)))
    dt = points.dtype
    xb = points.reshape(B, nb, 128, C)
    # match the CPU/vmap path's jnp indexing semantics (negative wraps
    # once, out-of-range clamps): an unnormalized index would match NO hi
    # block here and silently return a zero row
    idx = jnp.clip(jnp.where(idx < 0, idx + N, idx), 0, N - 1)
    hi = idx // 128
    lo = idx - hi * 128
    v = (lo[:, :, None]
         == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)).astype(dt)
    r = jnp.einsum("bjl,bklc->bjkc", v, xb,
                   precision=jax.lax.Precision.HIGHEST)  # [B, J, NB, C]
    u = (hi[:, :, None]
         == jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)).astype(dt)
    return jnp.einsum("bjk,bjkc->bjc", u, r,
                      precision=jax.lax.Precision.HIGHEST)


def take_points(points: jnp.ndarray, idx: jnp.ndarray,
                blocked: Optional[bool] = None) -> jnp.ndarray:
    """Batched index_points (reference pointnet_util.py:44-61):
    points [B, N, C], idx [B, ...] int -> [B, ..., C]. Shared by the PNSA
    tokenizer and the pc baselines.

    On TPU, large float gathers take the blocked one-hot-contraction path
    (see _take_points_blocked — 45x-off-bandwidth XLA gather avoided);
    elsewhere a vmap'd take lowers to one XLA gather. Its AD transpose is
    two einsums (MXU) instead of an XLA scatter, so the train path wins
    too. Pass blocked= to force either path (tests pin blocked=True on
    CPU for exactness checks)."""
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    if blocked is None:
        from vitlens_tpu.ops.platform import is_tpu_default

        blocked = (is_tpu_default() and flat.shape[1] >= 1024
                   and points.shape[1] >= 1024
                   and jnp.issubdtype(points.dtype, jnp.floating))
    if blocked:
        out = _take_points_blocked(points, flat.astype(jnp.int32))
    else:
        out = jax.vmap(lambda pts, ind: pts[ind])(points, flat)
    return out.reshape(*idx.shape, points.shape[-1])


def group_points(
    xyz: jnp.ndarray,
    num_group: int,
    group_size: int,
    start: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    knn_exact: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS centers + kNN neighbourhoods, center-normalised.

    Mirrors reference Group.forward (dvae.py:143-176):
      center = fps(xyz, num_group); idx = knn(xyz, center, group_size);
      neighborhood = xyz[idx] - center
    Returns (neighborhood [B,G,M,3], center [B,G,3]).
    """
    center = fps(xyz, num_group, start=start, key=key)
    idx = knn_indices(xyz, center, group_size, exact=knn_exact)  # [B, G, M]
    neighborhood = take_points(xyz, idx)  # blocked on TPU — see take_points
    neighborhood = neighborhood - center[:, :, None, :]
    return neighborhood, center


def ball_query(
    xyz: jnp.ndarray,
    query: jnp.ndarray,
    radius: float,
    nsample: int,
    exact: Optional[bool] = None,
    recall_target: float = 0.95,
) -> jnp.ndarray:
    """Ball query: for each query point take up to `nsample` points within
    `radius`; out-of-ball slots are filled with the first in-ball index
    (reference: pointnet/pointnet_util.py:101-123).

    exact=None -> exact on CPU (bit-parity with the reference), approx on
    TPU. The selection is k-smallest over cand = (index if in-ball else N);
    lax.top_k lowers sort-like and costs 71.8 ms at the vitlensG shape
    ([16,512,10000] k=64) — 37% of the whole bigG encode batch.
    lax.approx_min_k (TPU PartialReduce) on the same candidates is 37.7 ms
    at recall_target=1.0 (bit-exact: candidate values are unique ints) and
    2.2 ms at 0.95 (scripts/bench_ball_query.py, 2026-08-17). At 0.95 the
    selected in-ball subset can differ from first-k-by-index — but WHICH
    in-ball points a ball query keeps is already arbitrary (the reference's
    first-by-index order is a CUDA loop artifact, and every selected point
    still lies within `radius`); downstream features are validated against
    exact in the bigG encode bench. Indices stay exactly representable in
    the fp32 approx path for N < 2^24.

    Returns [B, S, nsample] int32.
    """
    B, N, _ = xyz.shape
    S = query.shape[1]
    d = square_distance(query, xyz)  # [B,S,N]
    in_ball = d <= radius ** 2
    # Candidate indices: in-ball points keep their original index order,
    # out-of-ball points are pushed to the end (index set to N).
    arange = jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2)
    cand = jnp.where(in_ball, arange, N)
    if exact is None:
        from vitlens_tpu.ops.platform import is_tpu_default

        exact = not is_tpu_default()
    k = min(nsample, N)
    if exact or N >= 2 ** 24:
        sel = -jax.lax.top_k(-cand, k)[0]
        # top_k is exact: slot 0 is the true minimum candidate (= first
        # in-ball index when the ball is non-empty)
        first = sel[..., :1]
    else:
        vals, _ = jax.lax.approx_min_k(cand.astype(jnp.float32), k,
                                       recall_target=recall_target)
        sel = vals.astype(jnp.int32)
        # approx_min_k can miss EVERY in-ball candidate for a sparse ball
        # (~(1-recall)^m for m in-ball points), which would leave slot 0
        # at the out-of-ball sentinel N and let the fill index run out of
        # bounds (gathers clamp to N-1: an arbitrary far point would join
        # the group). Recompute the fill exactly: min over all candidates
        # IS the reference's group_first (first in-ball index), one cheap
        # reduce over the already-materialized candidate tensor.
        first = jnp.min(cand, axis=-1, keepdims=True)
    # a genuinely empty ball (no in-ball point at all) cannot happen for
    # FPS-center queries (the center itself is at distance 0), but clamp
    # so the degenerate case indexes in-bounds instead of UB
    first = jnp.minimum(first, N - 1)
    sel = jnp.where(sel == N, first, sel).astype(jnp.int32)
    if k < nsample:
        # nsample > N: the reference always returns nsample columns,
        # repeating group_first for the missing slots (query_ball_point)
        sel = jnp.concatenate(
            [sel, jnp.broadcast_to(first.astype(jnp.int32),
                                   (B, S, nsample - k))], axis=-1)
    return sel
