"""Backend dispatch predicate shared by every kernel auto-gate.

The FPS/kNN/ball-query selection, the fused-MLP and fused-LN-proj kernels
and flash attention all switch implementations on "is this computation
going to a TPU?". Centralised here so the answer cannot drift between ops
(it used to live as a private helper of the attention module)."""

from __future__ import annotations

import jax


def is_tpu_default() -> bool:
    """True when tracing for a TPU backend. jax_default_device (used by
    CPU-pinned tests even when a TPU plugin is registered) is respected —
    jax.default_backend() alone reports the highest-priority platform and
    would wrongly enable TPU kernels for CPU-pinned computations."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
