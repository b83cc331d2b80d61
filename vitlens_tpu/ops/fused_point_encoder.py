"""Fused mini-PointNet group encoder (Pallas): the PointBERT tokenizer's
per-group encoder in ONE kernel pass.

Reference semantics: dvae.py:179-212 `Encoder` — per group of M points,
  conv1 (3->128) -> BN -> ReLU -> conv2 (128->256) -> max over M = g
  cat([g, h]) -> conv3 (512->512) -> BN -> ReLU -> conv4 (512->C) -> max
with the conv3 concat already rewritten by distributivity
(adapters/tokenizers.py:334-347: cat([g,h]) @ W3 == g @ W3[:256] +
h @ W3[256:], exact).

Why a kernel: the XLA schedule streams every intermediate through HBM —
[B*G*M, 128] and [B*G*M, 256] bf16 activations (256 MB + 512 MB at B64)
plus the fp32 conv3 pre-BN tensor ([B*G*M, 512] fp32 = 2.1 GB), and the
two max-pools break XLA's fusion chains, so the 620 GF of matmuls run at
~17 TF/s (r4 breakdown, scripts/bench_pc_breakdown.py). This kernel tiles
over GROUPS: a tile of `tg` groups (tg*M rows) flows through all four
matmuls and both max-pools entirely in VMEM; only the [B*G, M, 3]
neighborhoods are read and the [B*G, C] features written. Weights
(3*128 + 128*256 + 2*256*512 + 512*C ~= 0.8 MB bf16) are VMEM-resident
across the whole grid via constant index maps.

Numerics mirror the XLA path cast-for-cast (tokenizers.py:329-351):
bf16 matmuls rounded once from fp32 accumulation, bf16 bias adds, eval
BatchNorm computed fp32 as (x - mean) * (rsqrt(var+eps)*scale) + bias,
conv3 accumulated fp32 across both split halves and rounded once.

Eval/inference only: the train path needs batch BN statistics (and their
cross-device pmean), so `point_tokenizer_apply` only dispatches here with
train=False. A custom_vjp (backward = jax.vjp of the XLA reference) keeps
the op differentiable for callers that embed eval-mode encodes in a loss
(e.g. linear probing on frozen features).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]

_BN_EPS = 1e-5  # tokenizers.batch_norm default

_INTERPRET = False  # tests flip this to run the kernel on CPU

# Groups per tile. tg=128 -> tg*M = 4096 rows per matmul at M=32; peak
# VMEM = fp32 conv3 tile (tg*M*512*4 = 8 MB) + bf16 intermediates + 0.8 MB
# weights, comfortably under the 64 MB scoped cap shared with fused_mlp.
_DEFAULT_TG = 128


def _tg() -> int:
    import os

    return int(os.environ.get("VITLENS_POINT_ENC_TG", str(_DEFAULT_TG)))


def _kernel(nb_ref, w1_ref, b1_ref, m1_ref, i1_ref, s1_ref,
            w2_ref, b2_ref, w3h_ref, w3g_ref, b3_ref,
            m2_ref, i2_ref, s2_ref, w4_ref, b4_ref, out_ref):
    tg, m, _ = nb_ref.shape
    x = nb_ref[:].reshape(tg * m, nb_ref.shape[2])

    # conv1 -> BN(eval) -> ReLU   [tg*M, c1]
    h = jnp.dot(x, w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[0, :].astype(x.dtype)
    h32 = (h.astype(jnp.float32) - m1_ref[0, :]) * i1_ref[0, :] + s1_ref[0, :]
    h = jax.nn.relu(h32.astype(x.dtype))

    # conv2 -> per-group max = g   [tg*M, c2], [tg, c2]
    h = jnp.dot(h, w2_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b2_ref[0, :].astype(x.dtype)
    c2 = h.shape[-1]
    g = jnp.max(h.reshape(tg, m, c2), axis=1)

    # conv3 by distributivity, fp32 accumulation rounded ONCE
    c3 = w3h_ref.shape[1]
    h32 = jnp.dot(h, w3h_ref[:], preferred_element_type=jnp.float32)
    g32 = jnp.dot(g, w3g_ref[:], preferred_element_type=jnp.float32)
    h32 = (h32.reshape(tg, m, c3) + g32[:, None, :]
           + b3_ref[0, :].astype(jnp.float32))
    h = h32.astype(x.dtype)

    # BN(eval) -> ReLU -> conv4 -> per-group max   [tg, c4]
    h32 = (h.astype(jnp.float32) - m2_ref[0, :]) * i2_ref[0, :] + s2_ref[0, :]
    h = jax.nn.relu(h32.astype(x.dtype)).reshape(tg * m, c3)
    h = jnp.dot(h, w4_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b4_ref[0, :].astype(x.dtype)
    c4 = h.shape[-1]
    out_ref[:] = jnp.max(h.reshape(tg, m, c4), axis=1)


def _bn_fold(p: Params, s: State):
    """Eval BN as (x - mean) * inv + bias with inv precomputed fp32 —
    the exact expression tokenizers.batch_norm evaluates."""
    inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + _BN_EPS)
    inv = inv * p["scale"].astype(jnp.float32)
    return (s["mean"].astype(jnp.float32)[None, :], inv[None, :],
            p["bias"].astype(jnp.float32)[None, :])


def _row(n, dtype_arr):  # replicated row operand, VMEM-resident
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del dtype_arr
    return pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pallas_point_encoder(nb, enc_p: Params, enc_s: State) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bg, m, din = nb.shape
    w1 = enc_p["conv1"]["w"].astype(nb.dtype)
    b1 = enc_p["conv1"]["b"].reshape(1, -1)
    w2 = enc_p["conv2"]["w"].astype(nb.dtype)
    b2 = enc_p["conv2"]["b"].reshape(1, -1)
    w3 = enc_p["conv3"]["w"].astype(nb.dtype)
    c2 = w2.shape[1]
    w3g, w3h = w3[:c2], w3[c2:]
    b3 = enc_p["conv3"]["b"].reshape(1, -1)
    w4 = enc_p["conv4"]["w"].astype(nb.dtype)
    b4 = enc_p["conv4"]["b"].reshape(1, -1)
    m1, i1, s1 = _bn_fold(enc_p["bn1"], enc_s["bn1"])
    m2, i2, s2 = _bn_fold(enc_p["bn2"], enc_s["bn2"])

    c1, c3, c4 = w1.shape[1], w3.shape[1], w4.shape[1]
    tg = min(_tg(), bg)
    const = lambda a, b: pl.BlockSpec(  # noqa: E731 - weight resident
        (a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    flops_rows = bg * m
    out = pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(bg, tg),),
        in_specs=[
            pl.BlockSpec((tg, m, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(din, c1), _row(c1, b1), _row(c1, m1), _row(c1, i1),
            _row(c1, s1),
            const(c1, c2), _row(c2, b2),
            const(c2, c3), const(c2, c3), _row(c3, b3),
            _row(c3, m2), _row(c3, i2), _row(c3, s2),
            const(c3, c4), _row(c4, b4),
        ],
        out_specs=pl.BlockSpec((tg, c4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, c4), nb.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * flops_rows * (din * c1 + c1 * c2 + c2 * c3 + c3 * c4)
            + 2 * bg * c2 * c3,
            bytes_accessed=2 * (flops_rows * din + bg * c4),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(nb, w1, b1, m1, i1, s1, w2, b2, w3h, w3g, b3, m2, i2, s2, w4, b4)
    return out


def xla_reference(nb, enc_p: Params, enc_s: State) -> jnp.ndarray:
    """Eval-mode mini-PointNet, the exact cast sequence of
    tokenizers.point_tokenizer_apply:329-351 (train=False)."""
    def bn(x, p, s):
        inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + _BN_EPS)
        inv = inv * p["scale"].astype(jnp.float32)
        y = (x.astype(jnp.float32) - s["mean"]) * inv + p["bias"]
        return y.astype(x.dtype)

    h = nb @ enc_p["conv1"]["w"].astype(nb.dtype) \
        + enc_p["conv1"]["b"].astype(nb.dtype)
    h = jax.nn.relu(bn(h, enc_p["bn1"], enc_s["bn1"]))
    h = h @ enc_p["conv2"]["w"].astype(nb.dtype) \
        + enc_p["conv2"]["b"].astype(nb.dtype)
    g = jnp.max(h, axis=-2, keepdims=True)
    w3 = enc_p["conv3"]["w"].astype(nb.dtype)
    d2 = h.shape[-1]
    h32 = (jnp.matmul(h, w3[d2:], preferred_element_type=jnp.float32)
           + jnp.matmul(g, w3[:d2], preferred_element_type=jnp.float32)
           + enc_p["conv3"]["b"].astype(jnp.float32))
    h = h32.astype(nb.dtype)
    h = jax.nn.relu(bn(h, enc_p["bn2"], enc_s["bn2"]))
    h = h @ enc_p["conv4"]["w"].astype(nb.dtype) \
        + enc_p["conv4"]["b"].astype(nb.dtype)
    return jnp.max(h, axis=-2)


@functools.lru_cache(maxsize=None)
def _make_op():
    @jax.custom_vjp
    def op(nb, enc_p, enc_s):
        return _pallas_point_encoder(nb, enc_p, enc_s)

    def fwd(nb, enc_p, enc_s):
        # grads through an eval-mode encode are rare (frozen-feature
        # probing); correctness beats speed here, so backward is the vjp
        # of the XLA reference (one recompute)
        return _pallas_point_encoder(nb, enc_p, enc_s), (nb, enc_p, enc_s)

    def bwd(res, g):
        nb, enc_p, enc_s = res
        _, pullback = jax.vjp(
            lambda n, p: xla_reference(n, p, enc_s), nb, enc_p)
        dnb, dp = pullback(g)
        return dnb, dp, jax.tree.map(jnp.zeros_like, enc_s)

    op.defvjp(fwd, bwd)
    return op


_FORCE_DISABLED = False


def set_point_encoder_enabled(enabled: bool) -> None:
    """Programmatic kill switch, same contract as
    fused_mlp.set_fused_mlp_enabled: TP/FSDP placement disables the kernel
    because GSPMD cannot propagate weight shardings through the opaque
    tpu_custom_call (parallel/tp.py, parallel/fsdp.py)."""
    global _FORCE_DISABLED
    _FORCE_DISABLED = not enabled


def point_encoder_available() -> bool:
    import os

    if _FORCE_DISABLED or os.environ.get("VITLENS_DISABLE_POINT_ENC_KERNEL"):
        return False
    from vitlens_tpu.ops.platform import is_tpu_default

    return is_tpu_default() or _INTERPRET


def point_encoder_applicable(nb: jnp.ndarray, enc_p: Params) -> bool:
    """[B, G, M, din] bf16 groups with lane-aligned channel widths and an
    M the in-kernel (tg, M, c) <-> (tg*M, c) reshapes keep sublane-aligned."""
    if nb.dtype != jnp.bfloat16 or nb.ndim != 4:
        return False
    m = nb.shape[2]
    # bf16's Mosaic sublane tile is 16 (fp32's is 8): the in-kernel
    # (tg, M, c) <-> (tg*M, c) collapses are only known-lowerable when M
    # is a multiple of 16 (M=16 and the flagship M=32 verified bit-exact
    # on-chip r4; M=8/24 would hit a non-sublane-aligned collapse at
    # compile time, not a fallback)
    if m % 16 != 0:
        return False
    c1 = enc_p["conv1"]["w"].shape[1]
    c2 = enc_p["conv2"]["w"].shape[1]
    c3 = enc_p["conv3"]["w"].shape[1]
    c4 = enc_p["conv4"]["w"].shape[1]
    if any(c % 128 != 0 for c in (c1, c2, c3, c4)):
        return False
    if enc_p["conv3"]["w"].shape[0] != 2 * c2:
        return False
    # all weights + one tile must fit the 64 MB scoped VMEM comfortably
    tile = _tg() * m * c3 * 4
    weights = 2 * (3 * c1 + c1 * c2 + 2 * c2 * c3 + c3 * c4)
    return tile + weights < 48 * 1024 * 1024


def fused_point_encoder(nb: jnp.ndarray, enc_p: Params,
                        enc_s: State) -> jnp.ndarray:
    """nb [B, G, M, din] -> features [B, G, c4] (eval-mode BN)."""
    b, g, m, din = nb.shape
    out = _make_op()(nb.reshape(b * g, m, din), enc_p, enc_s)
    return out.reshape(b, g, -1)
