"""ViT-L tri train-step throughput on the real chip (frozen CLIP towers,
full remat; pc additionally runs FPS+kNN in-graph). Steps are chained
inside ONE jit (lax.scan over the train step) so the tunnel's
per-dispatch latency cannot pollute the number. The TrainState input is
DONATED to the loop (r3): XLA aliases it with the scan carry, so peak HBM
is ~1x state instead of the ~2x that made audio B256 OOM by ~46 MB and
pc B128 by ~340 MB in r2. The final carried state is returned and fed to
the next trial (ping-pong), so no re-upload is needed.

Run:  BENCH_MODALITY=pc    BENCH_BATCH=64  timeout 1500 python scripts/bench_train_step.py
      BENCH_MODALITY=audio BENCH_BATCH=128 timeout 1500 python scripts/bench_train_step.py
Measured 2026-08-17 (r2, pre-donation): pc 122 samples/s/chip @ B64;
audio 122 samples/s/chip @ B128 (the r1 README figure of 93-94 was
CLI-path and partly dispatch-bound)."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp  # noqa: E401,E402

t0 = time.time(); x = jnp.ones((128, 128)); np.asarray(x @ x)
print("warmup", round(time.time() - t0, 1), flush=True)

from vitlens_tpu.config import make_model_config  # noqa: E402
from vitlens_tpu.models import tri  # noqa: E402
from vitlens_tpu.train.freeze import tri_model_mask  # noqa: E402
from vitlens_tpu.train.step import (  # noqa: E402
    OptimizerConfig, StepConfig, init_train_state, make_optimizer,
    make_train_step,
)

MODALITY = os.environ.get("BENCH_MODALITY", "pc")
B = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
DONATE = os.environ.get("BENCH_DONATE", "1") != "0"

cfg = make_model_config("ViT-L-14", MODALITY)
params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True,
                      lock_visual=True)
tx, mask = make_optimizer(
    params, OptimizerConfig(lr=1e-4, warmup=10, total_steps=1000,
                            grad_clip_norm=1.0), mask)
sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.bfloat16,
                remat=True, sync_bn=False)
step = make_train_step(cfg, tx, mask, sc, mesh=None)
ts = init_train_state(params, state, tx)
del params, state
rng = np.random.RandomState(0)
text = rng.randint(1, 49000, size=(B, 77)).astype(np.int32)
text[:, 0] = 49406; text[:, -1] = 49407
batch = {"image": jnp.asarray(rng.randn(B, 3, 224, 224), jnp.float32),
         "text": jnp.asarray(text),
         "visual": jnp.asarray(
             rng.randn(B, cfg.tower.point.npoints, 3) * 0.3, jnp.float32)
         if MODALITY == "pc"
         else jnp.asarray(rng.randn(B, 512, 128), jnp.float32)}


def loop_fn(ts, batch, key):
    def body(carry, i):
        nts, m = step(carry, batch, jax.random.fold_in(key, i))
        return nts, m["loss"]

    ts, losses = jax.lax.scan(body, ts, jnp.arange(ITERS))
    return ts, losses


loop = (jax.jit(loop_fn, donate_argnums=0) if DONATE else jax.jit(loop_fn))

key = jax.random.PRNGKey(1)
t0 = time.time()
ts, losses = loop(ts, batch, key)
np.asarray(losses)
print("compile_s", round(time.time() - t0, 1), flush=True)
best = 1e9
for _ in range(3):
    t0 = time.time()
    ts, losses = loop(ts, batch, key)
    np.asarray(losses)
    best = min(best, (time.time() - t0) / ITERS)
print(json.dumps({"metric": f"{MODALITY}_tri_train_samples_per_s_chip",
                  "batch": B, "donate": DONATE,
                  "value": round(B / best, 1),
                  "ms_per_step": round(best * 1e3, 1)}), flush=True)
