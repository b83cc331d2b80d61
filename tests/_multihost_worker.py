"""Worker for test_multihost.py — one rank of a 2-process CPU "multi-host" run.

Launched by the test with torchrun-style env (MASTER_ADDR/MASTER_PORT/
WORLD_SIZE/RANK — the reference's primary bootstrap, training/
distributed.py:24-69), CPU-only jax (JAX_PLATFORMS=cpu, axon site stripped)
and 4 forced host devices per process -> an 8-device global mesh.

Exercises the only §2.7 surface no single-process test can reach:
  - parallel.mesh.init_distributed env discovery + jax.distributed.initialize
  - a full tri train step jitted over a mesh that SPANS processes
    (gathered local-loss InfoNCE + sync-BN pmean across ranks)
  - shard_batch's process-local-data path and replicate's callback path
  - eval.metrics Accuracy merge via multihost_utils.process_allgather
  - broadcast_object / all_gather_object

Prints one MULTIHOST_OK json line; the test asserts on both ranks' output.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vitlens_tpu.parallel.mesh import (
        all_gather_object, broadcast_object, init_distributed, replicate,
        shard_batch,
    )

    rank_env = int(os.environ["RANK"])
    pid = init_distributed()
    assert pid == rank_env, (pid, rank_env)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    from jax.sharding import Mesh

    from vitlens_tpu.config import (
        ModelConfig, PerceiverConfig, PointAdapterConfig, TextArch,
        TowerConfig, VisionArch,
    )
    from vitlens_tpu.models import tri
    from vitlens_tpu.train.freeze import tri_model_mask
    from vitlens_tpu.train.step import (
        OptimizerConfig, StepConfig, init_train_state, make_optimizer,
        make_train_step,
    )

    mesh = Mesh(np.array(jax.devices()), ("data",))

    arch = VisionArch(image_size=28, patch_size=14, width=32, layers=2,
                      head_width=16)
    # pc modality: the BN tokenizer makes sync-BN pmean cross PROCESS here
    tower = TowerConfig(
        arch=arch, embed_dim=16, modality="pc",
        point=PointAdapterConfig(num_group=8, group_size=4, encoder_dims=16,
                                 trans_dim=16, npoints=32),
        perceiver=PerceiverConfig(
            depth=1, num_latents=4, latent_dim=32, input_dim=16,
            cross_heads=1, cross_dim_head=8, latent_heads=2,
            latent_dim_head=8,
        ),
    )
    cfg = ModelConfig(
        name="multihost", embed_dim=16, vision=arch,
        text=TextArch(context_length=8, vocab_size=64, width=32, heads=2,
                      layers=2),
        tower=tower,
    )
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True,
                          lock_visual=True)
    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=1e-3, warmup=2, total_steps=10,
                                grad_clip_norm=1.0), mask)
    sc = StepConfig(n_tower=3, local_loss=True, compute_dtype=jnp.float32,
                    sync_bn=True)
    step = make_train_step(cfg, tx, mask, sc, mesh=mesh)
    ts = replicate(mesh, init_train_state(params, state, tx))

    # deterministic GLOBAL batch; each process feeds only its local half
    rng = np.random.RandomState(0)
    n = 16
    text = rng.randint(1, 60, size=(n, 8)).astype(np.int32)
    text[:, -1] = 63
    batch_global = {
        "image": rng.randn(n, 3, 28, 28).astype(np.float32),
        "text": text,
        "visual": rng.randn(n, 32, 3).astype(np.float32),
    }
    lo, hi = pid * (n // 2), (pid + 1) * (n // 2)
    batch = shard_batch(
        mesh, {k: v[lo:hi] for k, v in batch_global.items()})
    ts, metrics = step(ts, batch, jax.random.PRNGKey(1))
    loss = float(np.asarray(metrics["loss"]))
    grad_norm = float(np.asarray(metrics["grad_norm"]))
    assert np.isfinite(loss) and grad_norm > 0, (loss, grad_norm)

    # metric merge across processes == single-process global computation
    from vitlens_tpu.eval.metrics import Accuracy

    logits = np.random.RandomState(1).randn(n, 4)
    targets = np.arange(n) % 4
    want = float(np.mean(np.argmax(logits, axis=1) == targets))
    acc = Accuracy()
    acc.compute(np.arange(lo, hi), logits[lo:hi], targets[lo:hi])
    merged = acc.merge_results()
    assert abs(merged["accuracy"] - want) < 1e-12, (merged, want)
    assert merged["score_cnt"] == n

    bcast = broadcast_object(f"ckpt-from-rank-{pid}")
    gathered = all_gather_object(pid)

    # collective sharded checkpointing: FSDP-place the state so leaves are
    # CROSS-PROCESS sharded (np.asarray on them is impossible — exactly the
    # case the host-numpy save cannot handle), save with each host writing
    # its own shards, restore onto the same shardings, compare local shards.
    ckpt_ok = None
    ckpt_root = os.environ.get("MULTIHOST_CKPT_DIR")
    if ckpt_root:
        from vitlens_tpu.parallel.fsdp import fsdp_place
        from vitlens_tpu.train import checkpoint as C

        ts_sh = fsdp_place(ts, mesh, min_elems=16)
        path = C.save_checkpoint_sharded(ckpt_root, ts_sh, epoch=1)
        ts_back = C.load_checkpoint_sharded(path, ts_sh)
        ckpt_ok = True
        for a, b in zip(jax.tree.leaves(ts_sh), jax.tree.leaves(ts_back)):
            assert a.sharding == b.sharding, (a.sharding, b.sharding)
            for sa, sb in zip(a.addressable_shards, b.addressable_shards):
                ckpt_ok &= bool(np.array_equal(np.asarray(sa.data),
                                               np.asarray(sb.data)))
        # rank 0 writes meta.json AFTER the collective-save barrier
        # releases everyone — poll briefly so non-zero ranks don't race it
        deadline = time.time() + 30
        meta = C.load_meta(path)
        while not meta and time.time() < deadline:
            time.sleep(0.2)
            meta = C.load_meta(path)
        ckpt_ok = bool(ckpt_ok and meta.get("sharded") is True)

    print("MULTIHOST_OK " + json.dumps({
        "rank": pid, "loss": round(loss, 6), "grad_norm": round(grad_norm, 6),
        "accuracy": merged["accuracy"], "bcast": str(bcast),
        "gather": list(np.asarray(gathered).reshape(-1).tolist()),
        "ckpt_roundtrip": ckpt_ok,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
