"""A/B the on-device fbank framing: gcd-strided slices vs the XLA gather.

The framing builds [B, 512, 400] frames from [B, 82160] waveforms. With
g = gcd(win, shift) = 80 the same frames are 5 static strided slices.
In-jit scan timing per the repo measurement rules (single-dispatch
timings are tunnel garbage).

Measured 2026-08-19 (v5e, B=64): sliced 4.588 ms/iter, gather 4.981
ms/iter — the 2D-iota gather does NOT lower to the ~1.1 us/row serial
path the grouping gathers hit (that would be ~36 ms here); the sliced
form wins a modest 8.6% and is immune to that cliff.
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, T, WIN, SHIFT = 64, 82160, 400, 160
NF = 1 + (T - WIN) // SHIFT
ITERS = 200


def frames_gather(x):
    idx = (jnp.arange(NF) * SHIFT)[:, None] + jnp.arange(WIN)[None, :]
    return x[:, idx]


def frames_sliced(x):
    g = math.gcd(WIN, SHIFT)
    s = SHIFT // g
    t_need = SHIFT * (NF - 1) + WIN
    base = x[:, :t_need].reshape(B, t_need // g, g)
    parts = [jax.lax.slice_in_dim(base, k, k + s * (NF - 1) + 1, s, axis=1)
             for k in range(WIN // g)]
    return jnp.stack(parts, axis=2).reshape(B, NF, WIN)


def timed(fn, x):
    def body(c, _):
        f = fn(c)
        # fold back to the carry so iterations chain (dependency)
        return c + f[:, 0, :T // WIN * 0 + 1].sum() * 0 + f.mean() * 1e-20, None

    @jax.jit
    def loop(x0):
        c, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return c

    r = loop(x)          # compile
    np.asarray(r)        # fence
    t0 = time.time()
    r = loop(x)
    np.asarray(r)
    dt = (time.time() - t0) / ITERS
    return dt


x = jnp.asarray(np.random.RandomState(0).randn(B, T).astype(np.float32))
for name, fn in [("sliced", frames_sliced), ("gather", frames_gather)]:
    dt = timed(fn, x)
    print(f"{name}: {dt*1e3:.3f} ms/iter  ({B*NF*WIN*4/dt/1e9:.1f} GB/s frame write)")
