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
) -> jnp.ndarray:
    """Batched farthest-point sampling indices.

    Args:
      xyz: [B, N, 3]
      npoint: number of samples (static)
      start: optional [B] int32 start indices; default 0 (deterministic)
      key: optional PRNG key -> random start like the reference (misc.py:60)
    Returns [B, npoint] int32 indices.
    """
    B, N, _ = xyz.shape
    if start is None:
        if key is not None:
            start = jax.random.randint(key, (B,), 0, N)
        else:
            start = jnp.zeros((B,), dtype=jnp.int32)
    start = start.astype(jnp.int32)

    xyz = xyz.astype(jnp.float32)
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


def knn_indices(xyz: jnp.ndarray, query: jnp.ndarray, k: int) -> jnp.ndarray:
    """k nearest neighbours of each query point. xyz [B,N,C], query [B,S,C]
    -> [B,S,k] int32 (reference: dvae.py:107-118 knn_point)."""
    d = square_distance(query, xyz)  # [B, S, N]
    _, idx = jax.lax.top_k(-d, k)
    return idx


def group_points(
    xyz: jnp.ndarray,
    num_group: int,
    group_size: int,
    start: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS centers + kNN neighbourhoods, center-normalised.

    Mirrors reference Group.forward (dvae.py:143-176):
      center = fps(xyz, num_group); idx = knn(xyz, center, group_size);
      neighborhood = xyz[idx] - center
    Returns (neighborhood [B,G,M,3], center [B,G,3]).
    """
    center = fps(xyz, num_group, start=start, key=key)
    idx = knn_indices(xyz, center, group_size)  # [B, G, M]
    B, G, M = idx.shape
    # vmap'd take over the batch axis lowers to a single XLA gather.
    gathered = jax.vmap(lambda pts, ind: pts[ind])(xyz, idx.reshape(B, G * M))
    neighborhood = gathered.reshape(B, G, M, xyz.shape[-1])
    neighborhood = neighborhood - center[:, :, None, :]
    return neighborhood, center


def ball_query(
    xyz: jnp.ndarray,
    query: jnp.ndarray,
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """Ball query: for each query point take up to `nsample` points within
    `radius`; out-of-ball slots are filled with the first in-ball index
    (reference: pointnet/pointnet_util.py:101-123).

    Returns [B, S, nsample] int32.
    """
    B, N, _ = xyz.shape
    S = query.shape[1]
    d = square_distance(query, xyz)  # [B,S,N]
    in_ball = d <= radius ** 2
    # Sort candidate indices: in-ball points keep their original index order,
    # out-of-ball points are pushed to the end (index set to N).
    arange = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2), (B, S, N)
    )
    cand = jnp.where(in_ball, arange, N)
    cand = jnp.sort(cand, axis=-1)[..., :nsample]
    first = cand[..., :1]
    return jnp.where(cand == N, first, cand).astype(jnp.int32)
