"""Native host-data library + video processor tests."""

import os

import numpy as np
import pytest

from vitlens_tpu.data import native

ASSETS = "/root/reference/assets/example"


@pytest.mark.skipif(not native.available(),
                    reason="native lib not built (run native/build.sh)")
class TestNative:
    def test_flac_decode_matches_python(self):
        from vitlens_tpu.data.audio_decode import decode_flac

        f = f"{ASSETS}/audio_dog.flac"
        wf_n, sr_n = native.decode_flac_native(f)
        wf_p, sr_p = decode_flac(f)
        assert sr_n == sr_p
        np.testing.assert_array_equal(wf_n, wf_p)

    def test_fps_matches_python(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(512, 3).astype(np.float32)
        nat = native.fps_native(pts, 64)
        # pure-python reference loop (bypasses the native fast path)
        n = pts.shape[0]
        dist = np.full(n, 1e10)
        far = 0
        idxs = np.zeros(64, np.int64)
        for i in range(64):
            idxs[i] = far
            d = np.sum((pts - pts[far]) ** 2, axis=-1)
            np.minimum(dist, d, out=dist)
            far = int(np.argmax(dist))
        np.testing.assert_array_equal(nat, pts[idxs])


class TestVideoProcessor:
    def test_frame_sampling_eval_and_train(self):
        from vitlens_tpu.data.video_processors import sample_frame_indices

        idx = sample_frame_indices(100, 8)
        assert len(idx) == 8
        assert np.all(np.diff(idx) > 0)
        rng = np.random.RandomState(0)
        idx_t = sample_frame_indices(100, 8, train=True, rng=rng)
        assert np.all((idx_t >= 0) & (idx_t < 100))

    def test_short_video_padding(self):
        from vitlens_tpu.data.video_processors import sample_frame_indices

        idx = sample_frame_indices(3, 8)
        assert len(idx) == 8
        assert np.all(idx < 3)

    def test_process_frames(self):
        from vitlens_tpu.data.video_processors import VideoProcessor

        frames = (np.random.RandomState(0).rand(10, 64, 80, 3) * 255).astype(
            np.uint8)
        vp = VideoProcessor(n_frames=4, size=56)
        out = vp([frames])
        assert out.shape == (1, 4, 3, 56, 56)

        vp3 = VideoProcessor(n_frames=4, size=56, three_crop=True)
        out3 = vp3.process_one(frames)
        assert out3.shape == (3, 4, 3, 56, 56)

    def test_video_file_without_decoder_raises(self):
        from vitlens_tpu.data.video_processors import VideoProcessor

        vp = VideoProcessor()
        with pytest.raises(RuntimeError, match="decode_fn"):
            vp.process_one("/nonexistent/video.mp4")
