"""A/B the fused mini-PointNet group-encoder kernel on the real chip.

Stages (all bf16, B=64 ViT-L pc geometry: G=512 groups, M=32):
  isolated op:  XLA eval mini-PointNet vs the Pallas kernel
  full encode:  pc-Lens encode kernel-off vs kernel-on

Run: timeout 1200 python scripts/bench_point_encoder.py
In-jit scan loops (CLAUDE.md: single-dispatch timings are garbage through
this tunnel); ITERS>=20 for the ~ms isolated op.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS_OP = int(os.environ.get("BENCH_ITERS_OP", "200"))
ITERS_E2E = int(os.environ.get("BENCH_ITERS_E2E", "10"))


def bench(fn, x, iters, *extra):
    # `extra` (params/state trees) ride as jit ARGUMENTS — closing over
    # them would bake GBs of weights in as constants (CLAUDE.md: that made
    # lowering pathological and once wedged the chip)
    @jax.jit
    def loop(x, *extra):
        def body(carry, _):
            out = fn(carry, *extra)
            return carry + 1e-6 * out, out

        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs

    t0 = time.time()
    np.asarray(loop(x, *extra))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x, *extra))
        best = min(best, (time.time() - t0) / iters)
    return best, comp


def main() -> int:
    x = jnp.ones((128, 128))
    np.asarray(x @ x)

    from vitlens_tpu.adapters import tokenizers as tok
    from vitlens_tpu.config import make_model_config
    from vitlens_tpu.models import tri
    from vitlens_tpu.ops import fused_point_encoder as FPE

    cfg = make_model_config("ViT-L-14", "pc")
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    pt = cfg.tower.point
    enc_p = params["visual"]["adapter"]["encoder"]
    enc_s = state["visual"]["adapter"]["encoder"]
    rng = np.random.RandomState(0)

    nb = jnp.asarray(rng.randn(BATCH * pt.num_group, pt.group_size, 3) * 0.3,
                     jnp.bfloat16)
    gf = 2 * nb.shape[0] * pt.group_size * (3 * 128 + 128 * 256 + 256 * 512
                                            + 512 * 256) / 1e9

    def run_xla(carry, p, s):
        return jnp.mean(FPE.xla_reference(carry, p, s))

    def run_kernel(carry, p, s):
        return jnp.mean(FPE._make_op()(carry, p, s))

    out = {}
    for name, fn in (("op_xla", run_xla), ("op_kernel", run_kernel)):
        sec, comp = bench(fn, nb, ITERS_OP, enc_p, enc_s)
        out[name] = sec
        print(json.dumps({"stage": name, "ms": round(sec * 1e3, 3),
                          "tflops": round(gf / sec / 1e3, 1),
                          "compile_s": round(comp, 1)}), flush=True)
    # numerics on-chip (Mosaic vs XLA, not interpret)
    d = np.abs(np.asarray(FPE._make_op()(nb, enc_p, enc_s), np.float32)
               - np.asarray(FPE.xla_reference(nb, enc_p, enc_s), np.float32))
    print(json.dumps({"max_abs_diff_on_chip": float(d.max())}), flush=True)

    pc = jnp.asarray(rng.randn(BATCH, pt.npoints, 3) * 0.3, jnp.float32)

    def run_full(carry, p, s):
        f, _ = tri.encode_visual(p, s, carry, cfg, normalize=True,
                                 compute_dtype=jnp.bfloat16)
        return jnp.mean(f)

    for name, env in (("e2e_kernel_on", None),
                      ("e2e_kernel_off", "1")):
        if env is None:
            os.environ.pop("VITLENS_DISABLE_POINT_ENC_KERNEL", None)
        else:
            os.environ["VITLENS_DISABLE_POINT_ENC_KERNEL"] = env
        sec, comp = bench(run_full, pc, ITERS_E2E, params, state)
        out[name] = sec
        print(json.dumps({"stage": name,
                          "ms_per_batch": round(sec * 1e3, 2),
                          "samples_per_s": round(BATCH / sec, 1),
                          "compile_s": round(comp, 1)}), flush=True)
    print(json.dumps({
        "op_speedup": round(out["op_xla"] / out["op_kernel"], 2),
        "e2e_speedup": round(out["e2e_kernel_off"] / out["e2e_kernel_on"], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
