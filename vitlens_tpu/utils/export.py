"""Model export (the TPU-native analogue of the reference's --torchscript /
--trace / --torchcompile options, model.py:1060-1076, audio_main.py:521-523).

jax.export serializes a jitted function to portable StableHLO that any
compatible JAX/XLA runtime can reload and run — the deployment artifact
equivalent of a TorchScript trace.
"""

from __future__ import annotations

from typing import Callable


def export_stablehlo(fn: Callable, *example_args, platforms=None) -> bytes:
    """Trace + serialize `fn` for the example argument shapes.

    platforms: lowering targets, e.g. ("tpu",) or ("cpu", "tpu");
    default = the current default backend."""
    import jax
    from jax import export as jexport

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(fn), **kw)(*example_args)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize; returns an object with `.call(*args)`."""
    from jax import export as jexport

    return jexport.deserialize(blob)


def export_encoder(model_cfg, params, state, example_input,
                   compute_dtype=None, platforms=None) -> bytes:
    """Serialize the visual encoder for serving. Weights are baked into the
    artifact as constants (closure), matching TorchScript-trace semantics."""
    import jax.numpy as jnp

    from vitlens_tpu.models import tri

    dt = compute_dtype or jnp.float32

    def encode(x):
        feats, _ = tri.encode_visual(params, state, x, model_cfg,
                                     normalize=True, compute_dtype=dt)
        return feats

    return export_stablehlo(encode, example_input, platforms=platforms)
