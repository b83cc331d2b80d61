"""Can a Pallas scalar-prefetch DMA gather beat XLA's serial row gather?

XLA gathers rows at ~1.1 us/row on this chip regardless of row width
(scripts/bench_gather_variants.py, bench_embed_gather.py). For NARROW rows
at grouping shapes the blocked one-hot contraction wins 10x (ops/fps.py),
but it degenerates at vocab-scale tables (all 386 blocks touched). The
remaining idea: a Pallas kernel whose input BlockSpec index_map reads the
scalar-prefetched indices — Mosaic pipelines the per-step HBM->VMEM row
DMAs, so the gather becomes overlapped DMAs instead of a serial loop.

  xla_gather   = jnp.take(table, ids, 0)   (the 11.2 ms baseline at B128*77)
  dma_gather   = pallas kernel, one [1, D] row block per grid step
  dma_gather8  = same with an [8, D] out block per step (8 grid steps of
                 input per output block via a 2d grid)

Run: timeout 1200 python scripts/bench_dma_gather.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, D = 49408, 512
B = int(os.environ.get("BENCH_BATCH", "128"))
T = 77
ITERS = int(os.environ.get("BENCH_ITERS", "200"))


def _copy_kernel(idx_ref, row_ref, out_ref):
    del idx_ref
    out_ref[:] = row_ref[:]


@functools.partial(jax.jit, static_argnames=())
def dma_gather(table, ids):
    # Mosaic requires the last two block dims (sublane, lane) to be
    # tile-divisible or full — a [1, D] row block is rejected. View the
    # table as [V, 8, D//8] so one row becomes a (1, 8, D//8) block whose
    # last two dims are full.
    J = ids.shape[0]
    t3 = table.reshape(V, 8, D // 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(J,),
        in_specs=[pl.BlockSpec((1, 8, D // 8),
                               lambda j, idx_ref: (idx_ref[j], 0, 0))],
        out_specs=pl.BlockSpec((1, 8, D // 8),
                               lambda j, idx_ref: (j, 0, 0)),
    )
    out = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((J, 8, D // 8), table.dtype),
        grid_spec=grid_spec,
    )(ids, t3)
    return out.reshape(J, D)


def bench(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return carry + (1e-6 * out[:1, :1].sum()).astype(carry.dtype), out
        c, _ = jax.lax.scan(body, a[0], None, length=iters)
        return c

    np.asarray(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(V, D), jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, V, size=(B * T,)), jnp.int32)

    got = np.asarray(dma_gather(table, ids))
    want = np.asarray(jnp.take(table, ids, axis=0))
    exact = bool((got == want).all())

    r = {
        "rows": B * T,
        "exact": exact,
        "xla_gather_ms": round(bench(lambda t, i: jnp.take(t, i, 0),
                                     table, ids), 3),
        "dma_gather_ms": round(bench(dma_gather, table, ids), 3),
    }
    print(json.dumps(r))


if __name__ == "__main__":
    main()
