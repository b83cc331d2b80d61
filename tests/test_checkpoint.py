"""Checkpoint save/latest/best/resume semantics."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitlens_tpu.train import checkpoint as C


def _state(v):
    return {"params": {"w": jnp.full((4, 4), float(v)), "b": jnp.zeros(4)},
            "step": jnp.asarray(v, jnp.int32)}


def test_save_latest_resume(tmp_path):
    root = str(tmp_path / "ckpt")
    C.save_checkpoint(root, _state(1), epoch=1)
    C.save_checkpoint(root, _state(2), epoch=2)
    latest = C.get_latest_checkpoint(root)
    assert latest.endswith("epoch_latest")
    restored = C.load_checkpoint(latest, _state(0))
    assert float(restored["params"]["w"][0, 0]) == 2.0
    assert C.load_meta(latest)["epoch"] == 2


def test_latest_falls_back_to_numbered(tmp_path):
    root = str(tmp_path / "ckpt")
    C.save_checkpoint(root, _state(3), epoch=3, is_latest=False)
    C.save_checkpoint(root, _state(7), epoch=7, is_latest=False)
    latest = C.get_latest_checkpoint(root)
    assert latest.endswith("epoch_7")


def test_best_tracking(tmp_path):
    root = str(tmp_path / "ckpt")
    assert C.save_best(root, _state(1), 1, metric=0.5) is not None
    assert C.save_best(root, _state(2), 2, metric=0.4) is None  # no improvement
    assert C.save_best(root, _state(3), 3, metric=0.9) is not None
    restored = C.load_checkpoint(os.path.join(root, "checkpoint_best"), _state(0))
    assert float(restored["params"]["w"][0, 0]) == 3.0


def test_resume_full_train_state(tmp_path):
    """Round-trip an actual TrainState including optimizer moments."""
    from vitlens_tpu.train.step import (
        OptimizerConfig, init_train_state, make_optimizer,
    )

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    tx, mask = make_optimizer(params, OptimizerConfig(lr=1e-3, warmup=1,
                                                      total_steps=10))
    ts = init_train_state(params, {}, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt2 = tx.update(grads, ts.opt_state, ts.params)
    import optax, dataclasses

    ts = dataclasses.replace(ts, params=optax.apply_updates(ts.params, updates),
                             opt_state=opt2, step=ts.step + 1)
    root = str(tmp_path / "ck")
    C.save_checkpoint(root, ts, epoch=1)
    fresh = init_train_state(params, {}, tx)
    restored = C.load_checkpoint(C.get_latest_checkpoint(root), fresh)
    assert int(restored.step) == 1
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(ts.params["w"]))
    # ckpt_only restore keeps fresh optimizer
    part = C.load_checkpoint(C.get_latest_checkpoint(root), fresh,
                             ckpt_only=True)
    assert int(part.step) == 0
    np.testing.assert_allclose(np.asarray(part.params["w"]),
                               np.asarray(ts.params["w"]))


def test_async_saver_orders_and_propagates(tmp_path):
    """AsyncSaver: writes execute in submit order on one worker; a failed
    save surfaces at wait()/close() instead of vanishing."""
    import pytest

    from vitlens_tpu.train import checkpoint as C

    order = []
    s = C.AsyncSaver()
    s.submit(lambda: order.append(1))
    s.submit(lambda: order.append(2))
    s.submit(lambda: order.append(3))
    s.wait()
    assert order == [1, 2, 3]

    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    s.submit(lambda: C.save_checkpoint(str(tmp_path), tree, 1))
    s.wait()
    got = C.load_checkpoint(str(tmp_path / "epoch_1"),
                            {"w": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(np.asarray(got["w"]), tree["w"])

    def boom():
        raise RuntimeError("disk full")

    s.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        s.wait()
    s.close()


def test_sharded_save_restore_and_reshard(tmp_path):
    """Collective (orbax) checkpointing of device-sharded state: shards
    round-trip exactly onto the same shardings, and a restore onto a
    DIFFERENT target layout (replicated) reshards on read — the property
    the multi-host resume path relies on (cli/train.py defers sharded
    resume until after fsdp_place). Cross-process coverage lives in
    tests/test_multihost.py; this runs the same API single-process on the
    8-virtual-device mesh so the normal suite guards it."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.local_devices(backend="cpu")[:4]
    mesh = Mesh(np.array(devs), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    state = {
        "params": {"w": jax.device_put(
            np.arange(32, dtype=np.float32).reshape(8, 4), sh)},
        "step": jax.device_put(np.int32(7), rep),
    }
    path = C.save_checkpoint_sharded(str(tmp_path / "ck"), state, epoch=3)
    assert C.load_meta(path).get("sharded") is True
    # latest mirror exists and resolves
    assert C.get_latest_checkpoint(str(tmp_path / "ck"))

    back = C.load_checkpoint_sharded(path, state)
    assert back["params"]["w"].sharding == sh
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(np.asarray(back["step"])) == 7

    # reshard-on-read: same file restored onto a replicated target
    target = jax.tree.map(lambda a: jax.device_put(np.asarray(a), rep), state)
    back2 = C.load_checkpoint_sharded(path, target)
    assert back2["params"]["w"].sharding == rep
    np.testing.assert_array_equal(np.asarray(back2["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
