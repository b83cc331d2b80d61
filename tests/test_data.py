"""Loader + dataset tests with synthetic fixtures."""

import json
import os
import tarfile
import wave

import numpy as np
import pytest

from vitlens_tpu.data.loader import (
    DataInfo,
    DataLoader,
    DevicePrefetcher,
    ShardedSampler,
    SyntheticDataset,
    TarShardDataset,
    brace_expand,
    build_loader,
    default_collate,
)


def test_sampler_deterministic_and_sharded():
    s0 = ShardedSampler(100, shard_id=0, n_shards=4, seed=7)
    s1 = ShardedSampler(100, shard_id=1, n_shards=4, seed=7)
    a, b = s0.indices(), s1.indices()
    assert len(a) == len(b) == 25
    assert set(a).isdisjoint(b)
    # same epoch -> same order; different epoch -> different
    assert np.array_equal(a, ShardedSampler(100, 0, 4, seed=7).indices())
    s0.set_epoch(1)
    assert not np.array_equal(a, s0.indices())


def test_dataloader_batches_and_retry():
    class Flaky:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            if i == 5:
                raise IOError("decode error")
            return {"x": np.full((3,), i, np.float32), "label": i}

    dl = DataLoader(Flaky(), batch_size=8, num_workers=2)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["x"].shape == (8, 3)
    all_vals = np.concatenate([b["label"] for b in batches])
    assert 5 not in all_vals  # substituted


def test_synthetic_dataset_and_prefetcher():
    ds = SyntheticDataset({"visual": ((4, 8), "f"), "text": ((7,), "i")}, n=16)
    info = build_loader(ds, batch_size=4, shuffle=False)
    assert info.num_batches == 4
    pf = DevicePrefetcher(info.dataloader)
    batches = list(pf)
    assert len(batches) == 4
    import jax.numpy as jnp

    assert isinstance(batches[0]["visual"], jnp.ndarray)


def test_prefetcher_map_fn_order_and_errors():
    """r3 threaded prefetcher: map_fn runs on the staging thread, order is
    preserved, dataset exceptions propagate (not swallowed by the pool)."""
    ds = SyntheticDataset({"x": ((2,), "f")}, n=12)
    info = build_loader(ds, batch_size=2, shuffle=False)
    seen = []
    pf = DevicePrefetcher(
        info.dataloader,
        map_fn=lambda b: (seen.append(len(seen)),
                          {"x": b["x"] * 0 + len(seen)})[1])
    vals = [float(np.asarray(b["x"]).ravel()[0]) for b in pf]
    assert vals == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # in order

    def boom(_):
        raise RuntimeError("bad batch")

    pf = DevicePrefetcher(info.dataloader, map_fn=boom)
    import pytest

    with pytest.raises(RuntimeError, match="bad batch"):
        list(pf)


def test_brace_expand():
    assert brace_expand("shard-{000..002}.tar") == [
        "shard-000.tar", "shard-001.tar", "shard-002.tar"]


def test_tar_shard_dataset(tmp_path):
    for s in range(2):
        with tarfile.open(tmp_path / f"shard-{s}.tar", "w") as tf:
            for i in range(3):
                key = f"{s}_{i}"
                data = json.dumps({"caption": f"cap {key}"}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(data)
                import io

                tf.addfile(info, io.BytesIO(data))
                arr = np.full((2, 2), i, np.float32).tobytes()
                info2 = tarfile.TarInfo(f"{key}.bin")
                info2.size = len(arr)
                tf.addfile(info2, io.BytesIO(arr))
    ds = TarShardDataset(str(tmp_path / "shard-{0..1}.tar"), shuffle=False,
                         decoders={"json": lambda b: json.loads(b)})
    items = list(ds)
    assert len(items) == 6
    keys = {k for k, _ in items}
    assert len(keys) == 6
    assert all("caption" in g["json"] for _, g in items)


def test_tar_shard_resampling(tmp_path):
    """Weighted with-replacement shard resampling (reference
    ResampledShards2, data.py:407-462) over REAL tar shards: respects
    n_resampled, draws by weight, re-draws per epoch deterministically."""
    import io

    for s in range(3):
        with tarfile.open(tmp_path / f"shard-{s}.tar", "w") as tf:
            data = json.dumps({"shard": s}).encode()
            info = tarfile.TarInfo(f"{s}_0.json")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    ds = TarShardDataset(str(tmp_path / "shard-{0..2}.tar"),
                         decoders={"json": lambda b: json.loads(b)},
                         resample_weights=[1.0, 0.0, 1.0], n_resampled=40,
                         seed=7)
    items = list(ds)
    assert len(items) == 40  # with-replacement: n_resampled, not n_shards
    drawn = [g["json"]["shard"] for _, g in items]
    assert set(drawn) <= {0, 2}  # zero-weight shard never drawn
    assert {0, 2} <= set(drawn)

    ds.set_epoch(1)
    drawn_e1 = [g["json"]["shard"] for _, g in ds]
    ds.set_epoch(0)
    drawn_e0 = [g["json"]["shard"] for _, g in ds]
    assert drawn_e0 == drawn  # epoch-keyed determinism
    assert drawn_e1 != drawn  # ...but different across epochs

    # shard splitting composes with resampling (each worker sees a slice)
    parts = []
    for wid in range(2):
        dsw = TarShardDataset(str(tmp_path / "shard-{0..2}.tar"),
                              shard_id=wid, n_shards=2,
                              decoders={"json": lambda b: json.loads(b)},
                              resample_weights=[1.0, 0.0, 1.0],
                              n_resampled=40, seed=7)
        parts.append([g["json"]["shard"] for _, g in dsw])
    assert len(parts[0]) + len(parts[1]) == 40


def _write_wav(path, seconds=1.0, sr=16000, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def test_esc50_like_dataset(tmp_path):
    from vitlens_tpu.data.datasets import ESC50Dataset

    audio_dir = tmp_path / "esc50" / "audio"
    audio_dir.mkdir(parents=True)
    anno = []
    for i in range(4):
        _write_wav(audio_dir / f"clip{i}.wav", seconds=5.0)
        anno.append({"uniq_id": i, "audio_path": f"esc50/audio/clip{i}.wav",
                     "text": "The sound of dog", "class_label": i % 2})
    anno_path = tmp_path / "fold.json"
    anno_path.write_text(json.dumps(anno))
    labels = {str(i): [f"class{i}"] for i in range(50)}
    label_path = tmp_path / "labels.json"
    label_path.write_text(json.dumps(labels))

    ds = ESC50Dataset(anno_path=str(anno_path), label_path=str(label_path),
                      data_root=str(tmp_path))
    assert len(ds) == 4
    item = ds[0]
    assert item["audio"].shape == (3, 512, 128)
    assert item["label"] == 0
    assert len(ds.classnames) == 50


def test_tag_dataset_fixture(tmp_path):
    from PIL import Image

    from vitlens_tpu.data.datasets import TAGDataset

    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    anno = []
    for i in range(3):
        p = img_dir / f"g{i}.jpg"
        Image.fromarray(
            (np.random.RandomState(i).rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(p)
        anno.append({"gel_path": f"frames/g{i}.jpg", "image_path": None,
                     "sr_label": i % 2, "material_label": None,
                     "hs_label": None})
    ap = tmp_path / "test_rough.json"
    ap.write_text(json.dumps(anno))
    ds = TAGDataset(split="test_rough", data_root=str(tmp_path),
                    anno_path=str(ap))
    item = ds[1]
    assert item["tactile"].shape == (3, 224, 224)
    assert item["label"] == 1
    assert ds.classnames == ["smooth", "rough"]


def test_rgbd_dataset_fixture(tmp_path):
    from vitlens_tpu.data.datasets import RGBDDataset

    anno = []
    for i, lab in enumerate(["kitchen", "office"]):
        d = np.random.RandomState(i).rand(48, 64).astype(np.float32) * 50
        np.save(tmp_path / f"disp{i}.npy", d)
        anno.append({"image_path": f"missing{i}.jpg",
                     "disparity_path": f"disp{i}.npy",
                     "label": lab, "cleaned_label": lab})
    ap = tmp_path / "val.json"
    ap.write_text(json.dumps(anno))
    ds = RGBDDataset(split="val", data_root=str(tmp_path), anno_path=str(ap))
    item = ds[0]
    assert item["depth"].shape == (1, 224, 224)
    assert ds.classnames == ["kitchen", "office"]


def test_modelnet_dat_fixture(tmp_path):
    import pickle

    from vitlens_tpu.data.datasets import ModelNetDataset

    names = [f"cls{i}" for i in range(40)]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    pts = [np.random.RandomState(i).randn(100, 6).astype(np.float32)
           for i in range(4)]
    labels = [np.array([i % 3]) for i in range(4)]
    with open(tmp_path / "modelnet40_test_64pts_fps.dat", "wb") as f:
        pickle.dump((pts, labels), f)
    ds = ModelNetDataset(data_root=str(tmp_path), npoints=64)
    item = ds[2]
    assert item["pc"].shape == (64, 3)
    assert item["label"] == 2
    assert np.max(np.linalg.norm(item["pc"], axis=1)) <= 1.0 + 1e-5


def test_objaverse_pickle_buckets(tmp_path, monkeypatch):
    import io
    import pickle

    from PIL import Image

    from vitlens_tpu.data.datasets import ObjaverseDataset

    root = tmp_path / "ulip_batches"
    rng = np.random.RandomState(0)

    def jpg_bytes(seed):
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.RandomState(seed).rand(48, 48, 3) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        return buf.getvalue()

    for b in range(2):
        d = root / f"bucket_{b}"
        d.mkdir(parents=True)
        for i in range(3):
            entry = (rng.randn(300, 3).astype(np.float32),
                     [jpg_bytes(b * 10 + i)], [["a chair render"]])
            pickle.dump(entry, open(d / f"{i}.pkl", "wb"))
    monkeypatch.setenv("VITLENS_PC_DATA_DIR", str(tmp_path))
    ds = ObjaverseDataset()
    assert len(ds) == 6
    item = ds[4]
    assert item["pc"].shape == (300, 3)
    assert item["image"].shape == (3, 224, 224)
    assert item["caption_str"] == "a chair render"
