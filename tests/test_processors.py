"""Processor tests on the real example assets + fbank property tests +
host-FPS parity vs the reference numpy implementation."""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets/example"

from vitlens_tpu.data import processors as P


def test_text_processor_shapes():
    tp = P.TextProcessor()
    ids = tp(["a bird", "A Photo: of a DOG!!"])
    assert ids.shape == (2, 77)
    assert ids.dtype == np.int32
    assert (ids[:, 0] == 49406).all()


def test_text_pre_caption_matches_reference_regex():
    tp = P.TextProcessor()
    assert tp.pre_caption('Hello; "World" (test)! #tag') == "hello world test tag"


def test_image_processor_on_assets():
    ip = P.ImageProcessor()
    x = ip([f"{ASSETS}/image_bird.jpg", f"{ASSETS}/image_dog.jpg"])
    assert x.shape == (2, 3, 224, 224)
    assert abs(float(x.mean())) < 3.0


def test_pc_processor_on_assets_matches_reference_fps():
    pc = np.load(f"{ASSETS}/pc_car_0260.npy")
    ours = P.PointCloudProcessor(n_sample_points=2048).process_array(pc)
    assert ours.shape == (2048, 3)
    # unit sphere
    assert abs(np.max(np.linalg.norm(ours, axis=1)) - 1.0) < 1e-5

    # parity with the reference numpy FPS (random start pinned via seed 0)
    from tests import ref_oracle

    ref_mod = ref_oracle.load("open_clip.modal_3d.processors.pc_processor")
    np.random.seed(123)
    want = ref_mod.farthest_point_sample(pc, 256)
    seed_start = np.random.RandomState(123)  # not same stream; pin manually
    # re-run ref with a known start by monkeypatching np.random.randint
    orig = np.random.randint
    try:
        np.random.randint = lambda *a, **k: 0
        want0 = ref_mod.farthest_point_sample(pc, 256)
    finally:
        np.random.randint = orig
    got0 = P.farthest_point_sample_np(pc, 256)  # start=0 deterministic
    np.testing.assert_allclose(got0, want0, atol=0)


def test_device_fps_matches_host_fps():
    import jax.numpy as jnp

    from vitlens_tpu.ops.fps import fps

    rng = np.random.RandomState(0)
    pc = rng.randn(2, 256, 3).astype(np.float32)
    dev = np.asarray(fps(jnp.asarray(pc), 32))
    for b in range(2):
        host = P.farthest_point_sample_np(pc[b], 32)
        np.testing.assert_allclose(dev[b], host, atol=1e-6)


def test_depth_processor():
    disparity = np.random.RandomState(0).rand(240, 320).astype(np.float32) * 100
    d = P.DepthProcessor().process_array(disparity)
    assert d.shape == (1, 224, 224)


def test_eeg_processor():
    eeg = np.random.RandomState(0).randn(128, 500).astype(np.float32)
    out = P.EEGProcessor().process_array(eeg)
    assert out.shape == (128, 512)
    # endpoint preservation of linear resample over the cropped window
    np.testing.assert_allclose(out[:, 0], eeg[:, 20], atol=1e-5)
    np.testing.assert_allclose(out[:, -1], eeg[:, 459], atol=1e-5)


def test_audio_processor_on_assets():
    ap = P.AudioProcessor()
    x = ap([f"{ASSETS}/audio_dog.flac"])
    assert x.shape == (1, 3, 512, 128)
    # 5s audio == clip duration -> all 3 clips identical
    np.testing.assert_allclose(x[0, 0], x[0, 1], atol=0)
    # normalized fbank should be zero-ish mean, unit-ish std over speech-ish audio
    assert -3 < float(x.mean()) < 3


class TestFbank:
    def test_frame_count(self):
        from vitlens_tpu.ops.fbank import fbank

        wav = np.random.RandomState(0).randn(16000 * 5).astype(np.float32)
        fb = np.asarray(fbank(wav))
        # snip_edges: 1 + (80000-400)//160 = 498 frames
        assert fb.shape == (498, 128)

    def test_silence_hits_log_floor(self):
        from vitlens_tpu.ops.fbank import EPS_F32, fbank

        fb = np.asarray(fbank(np.zeros(16000, np.float32)))
        np.testing.assert_allclose(fb, np.log(EPS_F32), atol=1e-5)

    def test_tone_peaks_at_right_mel_bin(self):
        from vitlens_tpu.ops.fbank import fbank, mel_filterbank

        sr, f0 = 16000, 1000.0
        t = np.arange(sr) / sr
        tone = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        fb = np.asarray(fbank(tone)).mean(axis=0)  # [128]
        peak_bin = int(np.argmax(fb))
        # expected bin: mel center closest to 1 kHz
        def mel(f):
            return 1127 * np.log(1 + f / 700)
        centers_mel = mel(20) + (np.arange(128) + 1) * (mel(8000) - mel(20)) / 129
        expect = int(np.argmin(np.abs(centers_mel - mel(f0))))
        assert abs(peak_bin - expect) <= 1

    def test_fixed_length_pad_and_normalize(self):
        from vitlens_tpu.ops.fbank import fbank_fixed_length

        wav = np.random.RandomState(0).randn(16000).astype(np.float32)  # 1s
        fb = np.asarray(fbank_fixed_length(wav, target_length=512))
        assert fb.shape == (512, 128)
        # tail frames are zero-padded THEN normalized -> constant -mean/std
        np.testing.assert_allclose(
            fb[200:], (0 - (-4.2677393)) / 4.5689974, atol=1e-5
        )


class TestPointCloudProcessorChannels:
    """channels>3 output for xyz+rgb towers (vitlensG / OpenShape PNSA,
    in_channel 6): xyz is FPS'd + unit-sphere normalized, rgb passes
    through; missing rgb fills with the OpenShape 0.4 gray
    (train/openshape.py ObjaverseNpy rgb default)."""

    def test_xyz_only_input_fills_gray(self):
        from vitlens_tpu.data.processors import PointCloudProcessor

        rng = np.random.RandomState(0)
        pc = rng.randn(300, 3).astype(np.float32) * 5.0
        proc = PointCloudProcessor(n_sample_points=64, channels=6)
        out = proc([pc])
        assert out.shape == (1, 64, 6)
        r = np.linalg.norm(out[0, :, :3], axis=1)
        assert abs(r.max() - 1.0) < 1e-5  # xyz normalized to unit sphere
        np.testing.assert_allclose(out[0, :, 3:], 0.4)

    def test_rgb_passthrough_unnormalized(self):
        from vitlens_tpu.data.processors import PointCloudProcessor

        rng = np.random.RandomState(1)
        xyz = rng.randn(300, 3).astype(np.float32) * 5.0
        rgb = rng.rand(300, 3).astype(np.float32)
        proc = PointCloudProcessor(n_sample_points=300, channels=6)
        out = proc([np.concatenate([xyz, rgb], axis=1)])[0]
        # n == N: no sampling; rgb columns must be bit-identical
        np.testing.assert_array_equal(out[:, 3:], rgb)
        assert abs(np.linalg.norm(out[:, :3], axis=1).max() - 1.0) < 1e-5

    def test_channels_3_unchanged(self):
        from vitlens_tpu.data.processors import PointCloudProcessor

        rng = np.random.RandomState(2)
        pc = rng.randn(300, 3).astype(np.float32)
        a = PointCloudProcessor(n_sample_points=64)([pc])
        assert a.shape == (1, 64, 3)
