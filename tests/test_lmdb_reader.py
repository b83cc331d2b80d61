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


def test_three_level_btree_small_pages(tmp_path):
    """Deep tree (VERDICT r3 item 6): psize=512 forces ~2 entries/leaf, so
    500 entries need leaf -> branch -> branch-root = depth >= 3; every key
    must still resolve through the multi-level descent."""
    rng = np.random.RandomState(1)
    items = {f"k{i:05d}".encode(): bytes(rng.randint(0, 256, 100, np.uint8))
             for i in range(500)}
    path = os.path.join(str(tmp_path), "deep")
    lmdb_reader.write_lmdb(path, items, psize=512)

    env = lmdb_reader.open(path)
    st = env.stat()
    assert st["psize"] == 512
    assert st["depth"] >= 3, st
    assert st["branch_pages"] > 1  # more than one branch page => multilevel
    assert st["entries"] == 500
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, k
        # misses that land between existing keys at every level
        for probe in (b"k00000\x00", b"k00250a", b"a", b"z", b"k99999"):
            assert txn.get(probe) is None, probe
        assert [k for k, _ in txn.cursor()] == sorted(items)


@pytest.mark.parametrize("psize", [512, 2048, 8192, 16384])
def test_nondefault_page_sizes(tmp_path, psize):
    """The meta-probe must find the right page size without being told."""
    rng = np.random.RandomState(psize)
    items = {f"key{i}".encode(): bytes(rng.randint(0, 256, 64, np.uint8))
             for i in range(40)}
    # plus one overflow value sized past this psize
    items[b"huge"] = bytes(rng.randint(0, 256, psize * 2 + 7, np.uint8))
    path = os.path.join(str(tmp_path), f"ps{psize}")
    lmdb_reader.write_lmdb(path, items, psize=psize)
    env = lmdb_reader.open(path)
    assert env.stat()["psize"] == psize
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, (psize, k)


def test_overflow_values_at_page_boundaries(tmp_path):
    """Values sized exactly at / one off the overflow-page payload capacity
    (psize - 16-byte header) and exact page multiples — the chain length and
    the final partial page are all edge cases."""
    psize = 4096
    cap = psize - 16  # one overflow page's payload
    sizes = [cap - 1, cap, cap + 1, 2 * cap - 1, 2 * cap, 2 * cap + 1,
             psize, 2 * psize, 3 * cap + 5]
    rng = np.random.RandomState(2)
    items = {f"v{i:02d}".encode(): bytes(rng.randint(0, 256, s, np.uint8))
             for i, s in enumerate(sizes)}
    path = os.path.join(str(tmp_path), "ovf")
    lmdb_reader.write_lmdb(path, items, psize=psize)
    env = lmdb_reader.open(path)
    with env.begin() as txn:
        for k, v in items.items():
            got = txn.get(k)
            assert got == v, (k, len(got), len(v))
    # every one of these is F_BIGDATA: overflow page count must match the
    # ceil((header+payload)/psize) sum
    import math
    want = sum(math.ceil((16 + s) / psize) for s in sizes)
    assert env.stat()["overflow_pages"] == want


def test_near_capacity_keys_split_pages(tmp_path):
    """Long keys (near the ~half-page node cap) force one node per leaf and
    wide separators in the branch level; lookup and order must hold."""
    psize = 4096
    rng = np.random.RandomState(3)
    items = {}
    for i in range(24):
        # ~1700-byte keys: node = 8 + klen + vlen stays under psize/2 rule
        key = (f"{i:04d}".encode() + bytes(rng.randint(97, 123, 1700,
                                                       np.uint8)))
        items[key] = f"value-{i}".encode()
    path = os.path.join(str(tmp_path), "bigkeys")
    lmdb_reader.write_lmdb(path, items, psize=psize)
    env = lmdb_reader.open(path)
    st = env.stat()
    assert st["leaf_pages"] >= 12  # at most 2 such nodes per page
    assert st["depth"] >= 2
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v
        assert [k for k, _ in txn.cursor()] == sorted(items)


def test_empty_db(tmp_path):
    path = os.path.join(str(tmp_path), "empty")
    lmdb_reader.write_lmdb(path, {})
    env = lmdb_reader.open(path)
    assert env.stat()["entries"] == 0
    with env.begin() as txn:
        assert txn.get(b"anything") is None
        assert list(txn.cursor()) == []


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
