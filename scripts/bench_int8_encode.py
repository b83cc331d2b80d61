"""E2E A/B: int8 (W8A8) quantized ViT-L audio-Lens encode vs bf16.

The decisive test for the quantized serving mode (vitlens_tpu/quant.py):
per-op microbenches of int8 dot_general are fusion-sensitive (see
scripts/bench_int8_matmul.py — 1.0x-2.0x depending on shape), so the call
is made on the full encode: same model, same input, bf16 path (fused-MLP
Pallas kernel ON, the shipping configuration) vs int8 trunk.

Also measures on-chip feature fidelity (cosine) between the two paths.
Methodology per CLAUDE.md: ITERS chained encodes inside one jit, host
fetch fence, best of 3.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def _fence(x):
    np.asarray(jax.tree.leaves(x)[0])


def main():
    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri
    from vitlens_tpu.quant import quantize_tower_params

    cfg = make_model_config("ViT-L-14", "audio")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["visual"] = quantize_tower_params(params["visual"])

    fbank = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 512, 128), jnp.float32)

    def encode_one(p, s, x):
        f, _ = tri.encode_visual(p, s, x, cfg, normalize=True,
                                 compute_dtype=jnp.bfloat16)
        return f

    @jax.jit
    def loop(p, s, x):
        def body(carry, _):
            f = encode_one(p, s, carry)
            return carry + 1e-6 * jnp.mean(f), jnp.mean(f)

        _, outs = jax.lax.scan(body, x, None, length=ITERS)
        return outs

    # fidelity first (also warms both compiles of the single-encode graph)
    e = jax.jit(encode_one)
    # cast OUT of bfloat16 before the cosine: np sums of 768-element bf16
    # dot products accumulate in bf16 and corrupted an earlier fidelity
    # read to 0.83 (true value 0.9996)
    f_bf16 = np.asarray(e(params, state, fbank), np.float32)
    f_int8 = np.asarray(e(qparams, state, fbank), np.float32)
    cos = (f_bf16 * f_int8).sum(-1) / (
        np.linalg.norm(f_bf16, axis=-1) * np.linalg.norm(f_int8, axis=-1))
    print(f"feature cos int8 vs bf16: min {cos.min():.6f} "
          f"mean {cos.mean():.6f}", file=sys.stderr, flush=True)

    results = {}
    for name, p in [("bf16", params), ("int8", qparams)]:
        t0 = time.time()
        _fence(loop(p, state, fbank))
        compile_s = time.time() - t0
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            _fence(loop(p, state, fbank))
            best = max(best, BATCH * ITERS / (time.time() - t0))
        results[name] = best
        print(f"{name}: {best:.1f} samples/s (compile {compile_s:.0f}s)",
              flush=True)
    print(f"int8/bf16 = {results['int8'] / results['bf16']:.3f}x "
          f"(cos min {cos.min():.5f})", flush=True)


if __name__ == "__main__":
    main()
