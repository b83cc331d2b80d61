"""SyncBN == BN over the concatenated global batch.

The reference converts BN to torch SyncBatchNorm for distributed runs
(audio_main.py:346-347), which computes GLOBAL batch mean/var. The trap:
pmean of locally-centered per-shard variances underestimates the global
variance whenever shard means differ — the moments must be synced
instead. This test feeds shards with deliberately different means."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vitlens_tpu.adapters.tokenizers import batch_norm


def test_sync_bn_matches_global_batch_stats():
    rng = np.random.RandomState(0)
    C = 6
    # shard 0 ~ N(0,1), shard 1 ~ N(3,2): very different shard means
    xa = rng.randn(4, 5, C).astype(np.float32)
    xb = (3.0 + 2.0 * rng.randn(4, 5, C)).astype(np.float32)
    x = np.concatenate([xa, xb])
    p = {"scale": jnp.asarray(rng.rand(C), jnp.float32),
         "bias": jnp.asarray(rng.randn(C), jnp.float32)}
    s = {"mean": jnp.zeros(C), "var": jnp.ones(C)}

    want_y, want_s = batch_norm(jnp.asarray(x), p, s, train=True)

    devs = jax.local_devices(backend="cpu")[:2]
    mesh = Mesh(np.array(devs), ("data",))

    def f(xs, p, s):
        return batch_norm(xs, p, s, train=True, axis_name="data")

    got_y, got_s = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("data"), P(), P()),
        out_specs=(P("data"), P()), check_vma=False,
    ))(jnp.asarray(x), p, s)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s["mean"]),
                               np.asarray(want_s["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s["var"]),
                               np.asarray(want_s["var"]), rtol=1e-5)
