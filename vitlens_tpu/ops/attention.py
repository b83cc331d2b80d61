"""Attention ops.

Single entry point `dot_product_attention` used by every tower (ViT trunk,
text tower, perceiver Lens). The HOT path is the plain XLA einsum — XLA's
fused attention wins for the short sequences every ViT-Lens tower sees
(77-600 tokens; measured crossover at KV ~4096, CLAUDE.md). The Pallas
flash kernel engages automatically only at KV >= 4096 on TPU.

Replaces the reference's torch.nn.MultiheadAttention / xformers
memory_efficient_attention usage (reference: open_clip/transformer.py:214,
perceiver.py:127-152).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """Reference XLA path. q,k,v: [B, H, N, Dh]; mask additive [..., Nq, Nk]."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = logits + mask
    # softmax in fp32 for stability regardless of compute dtype
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention core.

    Args:
      q: [B, H, Nq, Dh]
      k, v: [B, H, Nk, Dh]
      mask: optional additive mask broadcastable to [B, H, Nq, Nk].
        NB a mask always takes the XLA path — the kernel has no mask
        support, so `use_flash=True` is ignored when mask is not None.
      scale: defaults to Dh ** -0.5
      use_flash: force/disable the Pallas kernel (masked calls excepted,
        see above); default = auto (TPU and shapes large enough to
        benefit).
    Returns [B, H, Nq, Dh].
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_flash is None:
        # Measured on v5e: XLA's fused attention beats the Pallas kernel for
        # ViT-Lens's short sequences (crossover is at KV length ~4k: at
        # NK=4096 the kernel is ~12% faster, below that XLA wins — the
        # kernel pays head_dim 64 -> 128-lane padding).
        use_flash = (
            _flash_available()
            and k.shape[-2] >= 4096
            and q.shape[-1] <= 128
            and q.shape[-3] * q.shape[-4] >= 4  # enough grid cells to matter
        )
    if use_flash and mask is None:
        from vitlens_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale)
    return _xla_attention(q, k, v, mask, scale)


def _flash_available() -> bool:
    """Back-compat alias; the shared predicate lives in ops/platform.py."""
    from vitlens_tpu.ops.platform import is_tpu_default

    return is_tpu_default()


def causal_mask(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask [n, n]: 0 on/below diagonal, -inf above.

    Matches reference TextTransformer.build_attention_mask
    (transformer.py:870-876)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, dtype=dtype), k=1)
