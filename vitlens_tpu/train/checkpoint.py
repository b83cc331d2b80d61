"""Checkpoint save/resume.

Mirrors the reference semantics (audio_main.py:119-185, :404-437, :564-611;
SURVEY §5.4): per-epoch `epoch_N` checkpoints, an atomically-replaced
`epoch_latest`, best-checkpoint tracking keyed on summed val accuracy,
resume = newest epoch checkpoint with model/optimizer/step restored, and
`resume_ckpt_only` (weights sans optimizer). Orbax handles the array
serialization; the directory/latest/best policy lives here.

Remote mirroring (reference file_utils.py remote_sync via aws s3/fsspec) is
exposed as a background-thread hook `start_remote_sync` using fsspec when
available.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_path(root: str, tag: str) -> str:
    return os.path.join(root, tag)


def save_checkpoint(
    root: str,
    state: Any,
    epoch: int,
    *,
    is_latest: bool = True,
    best_metric: Optional[float] = None,
    extra: Optional[Dict] = None,
    tag: Optional[str] = None,
) -> str:
    """Save `state` (any pytree, e.g. TrainState) under epoch_{N} (or
    `tag`, e.g. a mid-epoch preemption snapshot); update epoch_latest
    atomically via tmp+rename (audio_main.py:590-597)."""
    os.makedirs(root, exist_ok=True)
    path = _ckpt_path(root, tag or f"epoch_{epoch}")
    _save_tree(path, state)
    meta = {"epoch": epoch, "extra": extra or {}}
    if best_metric is not None:
        meta["best_metric"] = best_metric
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if is_latest:
        tmp = _ckpt_path(root, "epoch_latest.tmp")
        latest = _ckpt_path(root, "epoch_latest")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(path, tmp)
        if os.path.exists(latest):
            shutil.rmtree(latest)
        os.replace(tmp, latest)
    return path


def save_best(root: str, state: Any, epoch: int, metric: float) -> Optional[str]:
    """Keep checkpoint_best if `metric` improves (audio_main.py:599-611)."""
    best_meta = os.path.join(root, "best.json")
    prev = -float("inf")
    if os.path.exists(best_meta):
        with open(best_meta) as f:
            prev = json.load(f)["metric"]
    if metric <= prev:
        return None
    path = _ckpt_path(root, "checkpoint_best")
    if os.path.exists(path):
        shutil.rmtree(path)
    _save_tree(path, state)
    with open(best_meta, "w") as f:
        json.dump({"metric": metric, "epoch": epoch}, f)
    return path


def get_latest_checkpoint(root: str) -> Optional[str]:
    """Newest epoch checkpoint (reference get_latest_checkpoint
    audio_main.py:63-83): epoch_latest / the latest.json pointer (sharded
    saves write a pointer, not a copy) if present, else highest epoch_N.

    A run dir can hold BOTH markers (e.g. single-host epochs followed by a
    multi-host --fsdp continuation): resolve to whichever was written last,
    otherwise a stale epoch_latest would silently replay old epochs."""
    cands_marked = []
    latest = _ckpt_path(root, "epoch_latest")
    if os.path.isdir(latest):
        cands_marked.append((os.path.getmtime(latest), latest))
    pointer = os.path.join(root, "latest.json")  # sharded saves (no copy)
    if os.path.exists(pointer):
        with open(pointer) as f:
            p = os.path.join(root, json.load(f)["tag"])
        if os.path.isdir(p):
            cands_marked.append((os.path.getmtime(pointer), p))
    if cands_marked:
        return max(cands_marked)[1]
    cands = []
    for p in glob.glob(os.path.join(root, "epoch_*")):
        m = re.match(r".*epoch_(\d+)$", p)
        if m:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def load_checkpoint(path: str, target: Any, *, ckpt_only: bool = False) -> Any:
    """Restore a pytree saved by save_checkpoint. With ckpt_only=True only
    the `params`/`model_state` fields of a TrainState are restored
    (--resume-ckpt-only)."""
    restored = _load_tree(path, target)
    if ckpt_only and hasattr(target, "params"):
        import dataclasses

        return dataclasses.replace(
            target, params=restored.params, model_state=restored.model_state
        )
    return restored


def load_meta(path: str) -> Dict:
    mp = os.path.join(path, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return {}


# ---------------------------------------------------------------------------
# serialization backends
# ---------------------------------------------------------------------------


def _save_tree(path: str, tree: Any) -> None:
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if os.path.exists(path):
            shutil.rmtree(path)
        # store as host numpy: restore then needs no sharding metadata and
        # works across device topologies
        host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
        ckptr.save(os.path.abspath(path), host_tree)
    else:  # pragma: no cover
        os.makedirs(path, exist_ok=True)
        leaves, treedef = jax.tree.flatten(tree)
        np.savez(os.path.join(path, "leaves.npz"),
                 *[np.asarray(l) for l in leaves])


def _path_str(path) -> str:
    from vitlens_tpu.parallel.mesh import path_str

    return path_str(path)


def _load_tree(path: str, target: Any) -> Any:
    if _HAVE_ORBAX:
        # Restore raw (no item) and graft leaves onto `target` by tree path —
        # avoids orbax's sharding-metadata restore requirements and works
        # across dataclass/dict structure differences.
        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(os.path.abspath(path))
        raw_map = {
            _path_str(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(raw)[0]
        }

        def pick(p, leaf):
            key = _path_str(p)
            if key not in raw_map:
                raise KeyError(f"checkpoint missing leaf {key!r}")
            v = raw_map[key]
            return jnp_like(leaf, v)

        return jax.tree_util.tree_map_with_path(pick, target)
    else:  # pragma: no cover
        data = np.load(os.path.join(path, "leaves.npz"))
        leaves = [data[k] for k in data.files]
        return jax.tree.unflatten(jax.tree.structure(target), leaves)


def jnp_like(ref_leaf, value):
    import jax.numpy as jnp

    arr = jnp.asarray(np.asarray(value))
    if hasattr(ref_leaf, "dtype"):
        arr = arr.astype(ref_leaf.dtype)
    return arr


# ---------------------------------------------------------------------------
# distributed (sharded, collective) checkpointing
# ---------------------------------------------------------------------------


def _collective_save(path: str, state: Any) -> None:
    """Orbax collective save of device-resident state: every process calls
    it; each host writes only its own array shards (no gather anywhere).
    Blocks until the write is finalized so donated buffers can be reused."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def save_checkpoint_sharded(
    root: str,
    state: Any,
    epoch: int,
    *,
    is_latest: bool = True,
    extra: Optional[Dict] = None,
    tag: Optional[str] = None,
) -> str:
    """Multi-host counterpart of save_checkpoint for cross-process-sharded
    state (FSDP/TP): a host snapshot (np.asarray) of such an array is
    impossible, so the shards are written collectively in place. `root`
    must be visible to every process (the standard orbax multihost
    contract — the reference's torch resume assumes shared storage too).
    COLLECTIVE: every process must call it with the same pytree."""
    os.makedirs(root, exist_ok=True)
    path = _ckpt_path(root, tag or f"epoch_{epoch}")
    _collective_save(path, state)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "extra": extra or {},
                       "sharded": True}, f)
        if is_latest:
            # a POINTER, not a copy: sharded checkpoints hold every host's
            # shards (multi-GB at bigG scale) and this runs on the training
            # critical path while other ranks wait at the next collective.
            # get_latest_checkpoint resolves latest.json when epoch_latest
            # is absent; tmp+rename keeps the update atomic.
            tmp = os.path.join(root, "latest.json.tmp")
            with open(tmp, "w") as f:
                json.dump({"tag": os.path.basename(path)}, f)
            os.replace(tmp, os.path.join(root, "latest.json"))
    return path


def save_best_sharded(root: str, state: Any, epoch: int,
                      metric: float) -> Optional[str]:
    """save_best for cross-process-sharded state. The improved/not decision
    is taken on rank 0 (sole reader/writer of best.json) and broadcast so
    every process agrees on whether to enter the collective save."""
    best_meta = os.path.join(root, "best.json")
    improved = None
    if jax.process_index() == 0:
        prev = -float("inf")
        if os.path.exists(best_meta):
            with open(best_meta) as f:
                prev = json.load(f)["metric"]
        improved = bool(metric > prev)
    if jax.process_count() > 1:
        from vitlens_tpu.parallel.mesh import broadcast_object

        improved = bool(broadcast_object(improved))
    if not improved:
        return None
    path = _ckpt_path(root, "checkpoint_best")
    _collective_save(path, state)
    if jax.process_index() == 0:
        with open(best_meta, "w") as f:
            json.dump({"metric": metric, "epoch": epoch}, f)
    return path


def load_checkpoint_sharded(path: str, target: Any, *,
                            ckpt_only: bool = False) -> Any:
    """Restore a collective checkpoint onto `target`'s shardings: every
    leaf comes back as a jax.Array laid out exactly like the target leaf
    (FSDP/TP/replicated — orbax reshards on read), so restore happens
    AFTER fsdp_place/replicate, unlike the host-numpy load_checkpoint.
    COLLECTIVE: every process must call it."""
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), abstract)
    if ckpt_only and hasattr(target, "params"):
        import dataclasses

        return dataclasses.replace(
            target, params=restored.params, model_state=restored.model_state
        )
    return restored


# ---------------------------------------------------------------------------
# async saving
# ---------------------------------------------------------------------------


class AsyncSaver:
    """Overlap checkpoint disk writes with training.

    The device->host fetch is done by the caller (cheap relative to the
    write, and it decouples the snapshot from donated device buffers); the
    orbax write + latest/best bookkeeping run on ONE background worker, so a
    slow filesystem never stalls a train step and writes stay strictly
    ordered (epoch_N before epoch_N+1, best.json reads see prior writes).

    The reference saves synchronously inside its epoch loop
    (audio_main.py:564-611); on TPU a multi-GB orbax write would otherwise
    idle the chip for seconds every epoch. `wait()` drains the queue and
    re-raises the first worker error (a silently dropped checkpoint must not
    look like a saved one)."""

    def __init__(self):
        import queue

        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - reported at wait()
                if self._err is None:
                    self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put(fn)

    def wait(self) -> None:
        """Block until every submitted save has finished."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._q.join()


# ---------------------------------------------------------------------------
# remote sync (reference file_utils.py:11-60)
# ---------------------------------------------------------------------------


def start_remote_sync(local_dir: str, remote_dir: str,
                      frequency_s: float = 300.0,
                      exclude: str = "epoch_latest") -> threading.Event:
    """Background mirror of the checkpoint dir to a remote fsspec location
    every `frequency_s` seconds, excluding the fast-churn latest checkpoint.
    Returns a stop Event."""
    stop = threading.Event()

    def sync_once():
        try:
            import fsspec

            fs, root = fsspec.core.url_to_fs(remote_dir)
            for dirpath, _dirs, files in os.walk(local_dir):
                if exclude and exclude in dirpath:
                    continue
                rel = os.path.relpath(dirpath, local_dir)
                for fn in files:
                    src = os.path.join(dirpath, fn)
                    dst = os.path.join(root, rel, fn) if rel != "." else os.path.join(root, fn)
                    fs.makedirs(os.path.dirname(dst), exist_ok=True)
                    fs.put(src, dst)
            return True
        except Exception:
            return False

    def loop():
        while not stop.wait(frequency_s):
            sync_once()
        sync_once()  # final sync (reference audio_main.py:617-628)

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    return stop
