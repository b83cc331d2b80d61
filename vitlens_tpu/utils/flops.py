"""FLOPs / cost statistics for a jitted function.

TPU equivalent of the reference's ptflops counting (--visual_stat_flops,
audio_tri_main.py:349-371): XLA's own cost analysis on the compiled
executable, which reflects the program actually run (post-fusion).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax


def cost_analysis(fn: Callable, *example_args, **example_kwargs) -> Dict[str, Any]:
    """Compile `fn` for the example args and return {flops, bytes_accessed,
    params (if args contain a params pytree), ...} from XLA."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # per-device list on some backends
        ca = ca[0] if ca else {}
    out = {
        "flops": float(ca.get("flops", -1.0)),
        "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
        "raw": dict(ca),
    }
    return out


def count_params(params) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_flops_report(model_cfg, modality_input, params, state,
                       compute_dtype=None,
                       scan_corrected: bool = True) -> Dict[str, Any]:
    """FLOPs for one encode_visual forward (the reference counts the visual
    tower: ptflops over model.visual).

    HloCostAnalysis counts a `lax.scan` body ONCE, so the N-layer scanned
    trunk is undercounted; scan_corrected adds (layers-1) x one-resblock
    flops (exact for the trunk, the dominant term — adapter-internal scans,
    if any, remain counted once)."""
    import jax.numpy as jnp

    from vitlens_tpu.models import tri

    dt = compute_dtype or jnp.float32

    def fwd(p, s, x):
        f, _ = tri.encode_visual(p, s, x, model_cfg, compute_dtype=dt)
        return f

    stats = cost_analysis(fwd, params, state, modality_input)
    stats["params_total"] = count_params(params["visual"])
    batch = modality_input.shape[0]
    if scan_corrected and stats["flops"] > 0:
        from vitlens_tpu.models import layers as L

        arch = model_cfg.tower.arch
        lat = jnp.zeros((batch, model_cfg.tower.num_tokens + 1, arch.width),
                        dt)
        one = jax.tree.map(lambda t: t[0],
                           params["visual"]["trunk"]["blocks"])
        per = cost_analysis(
            lambda h: L.resblock(h, one, arch.heads, L.gelu), lat)["flops"]
        stats["flops"] += (arch.layers - 1) * per
    if stats["flops"] > 0:
        stats["gflops_per_sample"] = stats["flops"] / batch / 1e9
    return stats
