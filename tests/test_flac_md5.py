"""Ground-truth verification of the from-scratch FLAC decoders.

A FLAC container's STREAMINFO block stores the MD5 of the UNENCODED PCM
(interleaved, little-endian, bps bits). Checking decoded output against it
verifies both decoders against the encoder that produced the file — true
ground truth with zero network access. (The C++==Python cross-check in
test_native_and_video.py guards consistency; this guards correctness.)
"""

import glob
import hashlib
import os

import numpy as np
import pytest

from vitlens_tpu.data import native
from vitlens_tpu.data.audio_decode import decode_flac

ASSETS = "/root/reference/assets/example"
FLACS = sorted(glob.glob(f"{ASSETS}/*.flac"))


def read_streaminfo(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"fLaC"
    pos = 4
    while True:
        header = data[pos]
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if header & 0x7F == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5 = body[18:34]
            return rate, channels, bps, total, md5
        pos += 4 + length
        if header & 0x80:
            raise AssertionError("no STREAMINFO")


def pcm_md5(wf: np.ndarray, bps: int) -> bytes:
    """wf float32 [channels, samples] in [-1, 1) -> MD5 of the raw PCM."""
    ints = np.rint(wf * float(1 << (bps - 1))).astype(np.int64)
    assert bps in (8, 16, 24, 32), bps
    interleaved = ints.T.reshape(-1)  # frame-major: s0c0 s0c1 s1c0 ...
    nbytes = bps // 8
    if nbytes == 2:
        raw = interleaved.astype("<i2").tobytes()
    elif nbytes == 1:
        raw = interleaved.astype(np.int8).tobytes()
    else:  # 24/32-bit: emit the low nbytes little-endian
        le32 = interleaved.astype("<i4").tobytes()
        raw = b"".join(
            le32[i:i + nbytes] for i in range(0, len(le32), 4)
        )
    return hashlib.md5(raw).digest()


@pytest.mark.skipif(not FLACS, reason="reference assets unavailable")
@pytest.mark.parametrize("path", FLACS, ids=[os.path.basename(p) for p in FLACS])
def test_python_decoder_matches_streaminfo_md5(path):
    rate, channels, bps, total, md5 = read_streaminfo(path)
    assert md5 != b"\x00" * 16, "encoder did not store an MD5"
    wf, sr = decode_flac(path)
    assert sr == rate
    assert wf.shape == (channels, total)
    assert pcm_md5(wf, bps) == md5


@pytest.mark.skipif(not FLACS or not native.available(),
                    reason="assets or native lib unavailable")
@pytest.mark.parametrize("path", FLACS, ids=[os.path.basename(p) for p in FLACS])
def test_native_decoder_matches_streaminfo_md5(path):
    rate, channels, bps, total, md5 = read_streaminfo(path)
    wf, sr = native.decode_flac_native(path)
    assert sr == rate
    assert wf.shape == (channels, total)
    assert pcm_md5(wf, bps) == md5
