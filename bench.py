"""Benchmark: ViT-L Lens encode throughput, samples/sec/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); its
implied comparator is ViT-L encode on A100. A100 bf16 ViT-L-14 inference at
typical ~50% MFU is ~1000 samples/s; vs_baseline is measured/1000.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_SEC = 1000.0
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main() -> int:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    # warm up device + tunnel with a trivial program
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()

    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri

    cfg = make_model_config("ViT-L-14", "audio")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def encode(params, state, fbank):
        feats, _ = tri.encode_visual(
            params, state, fbank, cfg,
            normalize=True, compute_dtype=jnp.bfloat16,
        )
        return feats

    fbank = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 512, 128), jnp.float32
    )

    # NOTE on methodology: on this backend block_until_ready() can return
    # before execution completes, and per-dispatch latency through the device
    # tunnel is ~15-20 ms. The benchmark therefore runs ITERS chained encodes
    # INSIDE one jit (lax.scan) and fences with a host fetch — measuring true
    # on-device throughput with amortised dispatch.
    @jax.jit
    def encode_loop(params, state, fbank):
        def body(carry, _):
            f, _s = tri.encode_visual(
                params, state, carry, cfg,
                normalize=True, compute_dtype=jnp.bfloat16,
            )
            nxt = carry + 1e-6 * jnp.mean(f)  # chain: no dead-code elision
            return nxt, jnp.mean(f)

        _, outs = jax.lax.scan(body, fbank, None, length=ITERS)
        return outs

    t0 = time.time()
    np.asarray(encode_loop(params, state, fbank))
    compile_s = time.time() - t0

    best = 0.0
    for _trial in range(3):
        t0 = time.time()
        np.asarray(encode_loop(params, state, fbank))
        dt = time.time() - t0
        best = max(best, BATCH * ITERS / dt)
    sps = best

    print(
        json.dumps(
            {
                "metric": "vitL_audio_lens_encode_samples_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
                "extra": {
                    "batch": BATCH,
                    "iters": ITERS,
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                    "compute_dtype": "bfloat16",
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
