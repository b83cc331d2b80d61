"""Pure-Python LMDB reader (vitlens_tpu/data/lmdb_reader.py) and the
ObjaverseDataset real-LMDB branch (VERDICT r2 item 8).

The fixture writer emits the on-disk structures per the LMDB 0.9 format
(meta pages, leaf/branch pages, overflow chains); the reader must serve
point gets, stats, and in-order iteration — including values large enough
to live on overflow pages and enough entries to force a branch root."""

import os
import pickle

import numpy as np
import pytest

from vitlens_tpu.data import lmdb_reader


def _write(tmp_path, items, name="bucket_0"):
    path = os.path.join(tmp_path, name)
    lmdb_reader.write_lmdb(path, items)
    return path


def test_roundtrip_single_leaf(tmp_path):
    items = {b"a": b"1", b"b": b"22", b"c": b"333"}
    path = _write(str(tmp_path), items)
    env = lmdb_reader.open(path, readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.stat()["entries"] == 3
        for k, v in items.items():
            assert txn.get(k) == v
        assert txn.get(b"zz") is None
    assert env.stat()["depth"] == 1
    assert env.stat()["leaf_pages"] == 1


def test_roundtrip_branch_and_overflow(tmp_path):
    rng = np.random.RandomState(0)
    items = {}
    # ~60 medium values -> multiple leaf pages -> branch root
    for i in range(60):
        items[str(i).encode()] = bytes(rng.randint(0, 256, 150, np.uint8))
    # two values big enough for multi-page overflow chains
    items[b"big1"] = bytes(rng.randint(0, 256, 9000, np.uint8))
    items[b"big2"] = bytes(rng.randint(0, 256, 5000, np.uint8))
    path = _write(str(tmp_path), items)

    env = lmdb_reader.open(path)
    st = env.stat()
    assert st["entries"] == 62
    assert st["depth"] == 2 and st["leaf_pages"] > 1
    assert st["overflow_pages"] >= (9000 // 4096 + 1) + (5000 // 4096 + 1)
    with env.begin() as txn:
        for k, v in items.items():
            got = txn.get(k)
            assert got == v, k
        assert txn.get(b"nope", b"dflt") == b"dflt"
        # in-order cursor matches LMDB byte order
        keys = [k for k, _ in txn.cursor()]
        assert keys == sorted(items)


def test_rejects_non_lmdb_file(tmp_path):
    p = os.path.join(str(tmp_path), "junk")
    with open(p, "wb") as f:
        f.write(b"\x00" * 8192)
    with pytest.raises(ValueError, match="meta"):
        lmdb_reader.open(p)


def test_objaverse_dataset_lmdb_branch(tmp_path):
    """The reference's Objverse buckets (modal_3d/datasets.py:395-494):
    LMDB files of pickled (pc, [jpeg bytes], [[captions]]) tuples — the
    branch that needed the lmdb package now runs on the pure reader."""
    from PIL import Image

    from vitlens_tpu.data.datasets import ObjaverseDataset

    rng = np.random.RandomState(0)
    import io

    def entry(i):
        pc = rng.randn(128, 3).astype(np.float32)
        buf = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)).save(buf, "JPEG")
        return pickle.dumps((pc, [buf.getvalue()], [[f"object {i}"]]))

    root = tmp_path / "ulip"
    root.mkdir()
    # two buckets, lengths 3 and 2 (cross-bucket indexing must hold)
    lmdb_reader.write_lmdb(
        str(root / "shard_0"),
        {str(i).encode("ascii"): entry(i) for i in range(3)})
    lmdb_reader.write_lmdb(
        str(root / "shard_1"),
        {str(i).encode("ascii"): entry(10 + i) for i in range(2)})

    ds = ObjaverseDataset(root=str(root), augment=False)
    assert len(ds) == 5
    for i in range(5):
        s = ds[i]
        assert s["pc"].shape == (128, 3)
        assert s["image"].shape[0] == 3
        assert isinstance(s["caption_str"], str)
