"""Hub tag resolution (cache path, no network) + remote-sync mirroring to a
local fsspec destination."""

import os
import time

import numpy as np
import pytest

from vitlens_tpu.utils import hub


def test_pretrained_registry_lookup():
    cfg = hub.get_pretrained_cfg("ViT-L-14", "datacomp_xl_s13b_b90k")
    assert cfg is not None and cfg["quick_gelu"] is False
    assert hub.get_pretrained_cfg("x", "vitlensL_audio") is not None
    assert hub.get_pretrained_cfg("ViT-L-14", "nonexistent_tag") is None


def test_resolve_prefers_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VITLENS_CKPT_CACHE_DIR", str(tmp_path))
    d = tmp_path / "ViT-L-14"
    d.mkdir()
    # hf-hub tags cache under the repo's weights filename
    f = d / "open_clip_pytorch_model.bin"
    f.write_bytes(b"x")
    assert hub.resolve_pretrained(
        "ViT-L-14", "datacomp_xl_s13b_b90k") == str(f)
    # direct-URL tags (openai) cache under the URL basename
    f2 = d / "ViT-L-14.pt"
    f2.write_bytes(b"x")
    assert hub.resolve_pretrained("ViT-L-14", "openai") == str(f2)

    # direct path passthrough
    p = tmp_path / "local.pt"
    p.write_bytes(b"y")
    assert hub.resolve_pretrained("whatever", str(p)) == str(p)

    with pytest.raises(KeyError):
        hub.resolve_pretrained("ViT-L-14", "unknown-tag")


def test_remote_sync_local_mirror(tmp_path):
    from vitlens_tpu.train.checkpoint import start_remote_sync

    src = tmp_path / "ckpts"
    dst = tmp_path / "mirror"
    (src / "epoch_1").mkdir(parents=True)
    (src / "epoch_1" / "data.bin").write_bytes(b"abc")
    (src / "epoch_latest").mkdir()
    (src / "epoch_latest" / "data.bin").write_bytes(b"zzz")

    stop = start_remote_sync(str(src), str(dst), frequency_s=0.2)
    time.sleep(0.6)
    stop.set()
    time.sleep(0.4)
    assert (dst / "epoch_1" / "data.bin").read_bytes() == b"abc"
    # epoch_latest excluded (reference file_utils.py skips it)
    assert not (dst / "epoch_latest").exists()
