"""Decide whether this TPU runs NATIVE int8 MXU dots, two ways:

1. Exactness: int8 x int8 -> int32 dot_general on random +-127 inputs has
   a unique exact integer answer. If the XLA TPU lowering detours through
   bf16 (products up to 16129 are NOT representable in bf16), results
   deviate from numpy's exact int math — which would also explain the
   quantized-encode fidelity collapse seen on-chip (cos 0.83 vs 0.9996 on
   CPU, scripts/bench_int8_encode.py).

2. Speed: a Pallas kernel doing jnp.dot(int8, int8, preferred int32) per
   tile. bf16 MXU peak is 197 TF/s; sustained >~200 TOP/s is only
   reachable on the native int8 path (394 TOP/s peak).

Run: timeout 540 python scripts/bench_int8_native.py
"""
import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_exactness():
    rng = np.random.RandomState(0)
    a = rng.randint(-127, 128, (512, 1024)).astype(np.int8)
    b = rng.randint(-127, 128, (1024, 512)).astype(np.int8)
    want = a.astype(np.int64) @ b.astype(np.int64)

    @jax.jit
    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    got = np.asarray(dot(jnp.asarray(a), jnp.asarray(b))).astype(np.int64)
    bad = int((got != want).sum())
    print(f"XLA int8 dot exactness: {bad}/{got.size} wrong elements "
          f"(max |err| {np.abs(got - want).max()})", flush=True)
    return bad == 0


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def pallas_int8_matmul(a, b, tm=512, tk=512, tn=512):
    m, k = a.shape
    _, n = b.shape
    k_steps = k // tk
    return pl.pallas_call(
        functools.partial(_mm_kernel, k_steps=k_steps),
        grid=(m // tm, n // tn, k_steps),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, s: (i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, s: (s, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, s: (i, j),
                              memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b)


def timed_tops(fn, a, b, iters=50):
    """Chain iterations through `a` (a loop-invariant body would let XLA
    hoist the dot out of the scan and report fantasy TOP/s)."""

    @jax.jit
    def loop(a, b):
        def body(c, _):
            o = fn(c, b)
            # data-dependent per-column perturbation touching ALL outputs
            col = jnp.sum(o, axis=0, keepdims=True)
            pert = jnp.sign(col)[:, : c.shape[1]].astype(c.dtype)
            return c + pert, None

        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c[0, 0]

    np.asarray(loop(a, b))
    t0 = time.time()
    np.asarray(loop(a, b))
    dt = (time.time() - t0) / iters
    return 2.0 * a.shape[0] * a.shape[1] * b.shape[1] / dt / 1e12


def main():
    ok = xla_exactness()

    rng = np.random.RandomState(0)
    M = K = N = 4096
    a = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    # pallas exactness on one small case first (interpret-free, on-chip)
    small_a, small_b = a[:512, :1024], b[:1024, :512]
    got = np.asarray(pallas_int8_matmul(small_a, small_b,
                                        tm=512, tk=512, tn=512))
    want = (np.asarray(small_a, np.int64) @ np.asarray(small_b, np.int64))
    bad = int((got.astype(np.int64) != want).sum())
    print(f"Pallas int8 dot exactness: {bad}/{got.size} wrong", flush=True)

    def xla_dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    print(f"XLA    int8 {M}^3: {timed_tops(xla_dot, a, b):6.1f} TOP/s",
          flush=True)
    print(f"Pallas int8 {M}^3: "
          f"{timed_tops(pallas_int8_matmul, a, b):6.1f} TOP/s", flush=True)

    abf = a.astype(jnp.bfloat16)
    bbf = b.astype(jnp.bfloat16)

    def bf16_dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    print(f"XLA    bf16 {M}^3: {timed_tops(bf16_dot, abf, bbf):6.1f} TF/s",
          flush=True)
    print("exact:", ok)


if __name__ == "__main__":
    main()
