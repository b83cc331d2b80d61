"""ViT-L video-Lens encode throughput (clips/s/chip) on the real chip.

The one modality without a recorded perf figure: 8-frame clips, per-frame
patch embed + learned temporal pos (reference vid_adapter_forward,
transformer.py:679-712), frames flattened to 8x256 tokens through the
perceiver into the 24-block trunk. Methodology per CLAUDE.md (chained
in-jit scan, host-fetch fence, best of 3).

Run: timeout 580 python scripts/bench_video_encode.py  [BENCH_BATCH=8]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main():
    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri

    cfg = make_model_config("ViT-L-14", "video")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    t = cfg.tower
    clips = jnp.asarray(np.random.RandomState(0).randn(
        BATCH, t.video.n_frames, 3, t.arch.image_size,
        t.arch.image_size) * 0.5, jnp.float32)
    print(f"clip shape {clips.shape} tokens {t.num_tokens}", file=sys.stderr,
          flush=True)

    @jax.jit
    def loop(p, s, x):
        def body(carry, _):
            f, _s = tri.encode_visual(p, s, carry, cfg, normalize=True,
                                      compute_dtype=jnp.bfloat16)
            return carry + 1e-6 * jnp.mean(f), jnp.mean(f)

        _, outs = jax.lax.scan(body, x, None, length=ITERS)
        return outs

    t0 = time.time()
    np.asarray(loop(params, state, clips))
    print(f"compile {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(params, state, clips))
        best = max(best, BATCH * ITERS / (time.time() - t0))
    print(f"video encode B{BATCH}: {best:.2f} clips/s/chip "
          f"({best * t.video.n_frames:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
