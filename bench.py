"""Benchmark: ViT-L Lens encode throughput, samples/sec/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); its
implied comparator is the SAME model on A100. vs_baseline is therefore
measured_samples_per_s / (A100 bf16 peak * 50% MFU / measured FLOPs-per-
sample from XLA cost analysis) — i.e. ratio to a well-tuned A100 running
this exact audio-Lens encode. MFU on the v5e is reported in extra.
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

A100_BF16_PEAK = 312e12
A100_ASSUMED_MFU = 0.5
V5E_BF16_PEAK = 197e12
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
    np.asarray(x @ x)  # block_until_ready is a no-op on axon; host-fetch fences

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

    # FLOPs per sample from XLA cost analysis. NOTE: HloCostAnalysis counts
    # a lax.scan body ONCE, so the 24-layer scanned trunk must be corrected
    # by adding (layers-1) x single-resblock flops.
    try:
        def _ca(f, *a):
            c = jax.jit(f).lower(*a).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0] if c else {}
            return float(c.get("flops", 0.0))

        from vitlens_tpu.models import layers as L

        ca_full = _ca(encode, params, state, fbank)
        lat = jnp.zeros((BATCH, cfg.tower.num_tokens + 1, cfg.tower.arch.width),
                        jnp.bfloat16)
        one_layer = jax.tree.map(lambda t: t[0],
                                 params["visual"]["trunk"]["blocks"])
        ca_layer = _ca(
            lambda h: L.resblock(h, one_layer, cfg.tower.arch.heads, L.gelu),
            lat)
        flops_per_sample = (
            ca_full + (cfg.tower.arch.layers - 1) * ca_layer) / BATCH
        flops_derivation = {
            # XLA HloCostAnalysis counts a lax.scan body ONCE; the scanned
            # 24-layer trunk is corrected by adding (layers-1) x one-resblock
            # flops: per_sample = (ca_full + (L-1)*ca_layer) / batch
            "xla_cost_analysis_full_graph_gflops": round(ca_full / 1e9, 2),
            "xla_cost_analysis_one_resblock_gflops": round(ca_layer / 1e9, 2),
            "trunk_layers": cfg.tower.arch.layers,
            "scan_correction": "per_sample=(full+(layers-1)*resblock)/batch",
        }
    except Exception:
        flops_per_sample = 0.0
        flops_derivation = {}
    a100_equiv = (A100_BF16_PEAK * A100_ASSUMED_MFU / flops_per_sample
                  if flops_per_sample > 0 else 1000.0)
    mfu = (sps * flops_per_sample / V5E_BF16_PEAK * 100
           if flops_per_sample > 0 else -1.0)

    print(
        json.dumps(
            {
                "metric": "vitL_audio_lens_encode_samples_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(sps / a100_equiv, 3),
                "extra": {
                    "batch": BATCH,
                    "iters": ITERS,
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                    "compute_dtype": "bfloat16",
                    "gflops_per_sample": round(flops_per_sample / 1e9, 1),
                    "v5e_mfu_pct": round(mfu, 1),
                    "a100_same_model_50mfu_samples_s": round(a100_equiv, 1),
                    "a100_comparator": (
                        "A100 bf16 peak 312e12 * assumed 0.5 MFU / "
                        "flops_per_sample; see flops_derivation"),
                    "flops_derivation": flops_derivation,
                    "shape_ceiling_evidence": "scripts/microbench.py",
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
