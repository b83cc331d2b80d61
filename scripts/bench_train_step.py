"""ViT-L tri train-step throughput on the real chip (frozen CLIP towers,
full remat; pc additionally runs FPS+kNN in-graph). Steps are chained
inside ONE jit (lax.scan over the train step) so the tunnel's
per-dispatch latency cannot pollute the number; state buffers are
carried, so peak HBM is ~2x a single step.

Run:  BENCH_MODALITY=pc    BENCH_BATCH=64  timeout 1500 python scripts/bench_train_step.py
      BENCH_MODALITY=audio BENCH_BATCH=128 timeout 1500 python scripts/bench_train_step.py
Measured 2026-08-17: pc 122 samples/s/chip @ B64 (was 99 before the
batched FPS kernel + kNN recall-cliff fix; B128 OOMs by ~340 MB under
the scan-carried state); audio 122 samples/s/chip @ B128 (the r1 README
figure of 93-94 was CLI-path and partly dispatch-bound; audio B256 OOMs
by ~46 MB under the carried state)."""

import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((128,128)); np.asarray(x@x); print("warmup", round(time.time()-t0,1), flush=True)
from vitlens_tpu.config import make_model_config
from vitlens_tpu.models import tri
from vitlens_tpu.train.freeze import tri_model_mask
from vitlens_tpu.train.step import (OptimizerConfig, StepConfig, init_train_state, make_optimizer, make_train_step)
MODALITY = os.environ.get("BENCH_MODALITY", "pc")
B = int(os.environ.get("BENCH_BATCH", "64")); ITERS = 8
cfg = make_model_config("ViT-L-14", MODALITY)
params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True, lock_visual=True)
tx, mask = make_optimizer(params, OptimizerConfig(lr=1e-4, warmup=10, total_steps=1000, grad_clip_norm=1.0), mask)
sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.bfloat16, remat=True, sync_bn=False)
step = make_train_step(cfg, tx, mask, sc, mesh=None)
ts = init_train_state(params, state, tx)
rng = np.random.RandomState(0)
text = rng.randint(1, 49000, size=(B, 77)).astype(np.int32); text[:, 0]=49406; text[:, -1]=49407
batch = {"image": jnp.asarray(rng.randn(B, 3, 224, 224), jnp.float32),
         "text": jnp.asarray(text),
         "visual": jnp.asarray(rng.randn(B, cfg.tower.point.npoints, 3)*0.3, jnp.float32)
         if MODALITY == "pc" else jnp.asarray(rng.randn(B, 512, 128), jnp.float32)}
@jax.jit
def loop(ts, batch, key):
    def body(carry, i):
        ts = carry
        ts, m = step(ts, batch, jax.random.fold_in(key, i))
        return ts, m["loss"]
    ts, losses = jax.lax.scan(body, ts, jnp.arange(ITERS))
    return losses
t0=time.time(); np.asarray(loop(ts, batch, jax.random.PRNGKey(1))); print("compile_s", round(time.time()-t0,1), flush=True)
best=1e9
for _ in range(3):
    t0=time.time(); np.asarray(loop(ts, batch, jax.random.PRNGKey(1))); best=min(best,(time.time()-t0)/ITERS)
print(json.dumps({"metric": f"{MODALITY}_tri_train_samples_per_s_chip", "batch": B, "value": round(B/best,1), "ms_per_step": round(best*1e3,1)}), flush=True)
