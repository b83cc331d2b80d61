"""Ground-truth oracle for ops/fbank.py.

torchaudio is absent from this image, so this file carries an INDEPENDENT
NumPy transliteration of the published Kaldi fbank algorithm
(kaldi/src/feat/feature-window.cc + mel-computations.cc, as exposed by
torchaudio.compliance.kaldi.fbank) written scalar-first (per-frame loops,
per-bin mel construction) rather than vectorized, so a constant-offset,
ordering, or mel-edge bug in the JAX implementation cannot be mirrored here.

Reference call under test: at_processor.py:388-406 —
fbank(htk_compat=True, window='hanning', sr=16k, 128 bins, 10 ms shift,
dither=0, use_energy=False).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from vitlens_tpu.ops.fbank import fbank, fbank_fixed_length


def kaldi_fbank_oracle(
    wave: np.ndarray,
    sample_freq: float = 16000.0,
    num_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemph: float = 0.97,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Scalar Kaldi fbank: [T] float -> [num_frames, num_bins] log-mel."""
    wave = np.asarray(wave, np.float64)
    window_size = int(sample_freq * frame_length_ms / 1000.0)
    window_shift = int(sample_freq * frame_shift_ms / 1000.0)
    padded = 1
    while padded < window_size:
        padded *= 2
    if high_freq <= 0.0:
        high_freq = 0.5 * sample_freq + high_freq

    # --- mel bank, one triangle at a time (mel-computations.cc) ---
    def mel_scale(freq):
        return 1127.0 * math.log(1.0 + freq / 700.0)

    num_fft_bins = padded // 2
    fft_bin_width = sample_freq / padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bank = np.zeros((num_bins, num_fft_bins))
    for b in range(num_bins):
        left_mel = mel_low + b * mel_delta
        center_mel = left_mel + mel_delta
        right_mel = center_mel + mel_delta
        for k in range(num_fft_bins):
            m = mel_scale(fft_bin_width * k)
            if left_mel < m < right_mel:
                if m <= center_mel:
                    bank[b, k] = (m - left_mel) / (center_mel - left_mel)
                else:
                    bank[b, k] = (right_mel - m) / (right_mel - center_mel)

    # --- framing + per-frame processing (feature-window.cc) ---
    num_frames = 1 + (len(wave) - window_size) // window_shift  # snip_edges
    hann = np.array(
        [0.5 - 0.5 * math.cos(2.0 * math.pi * n / (window_size - 1))
         for n in range(window_size)]
    )
    out = np.zeros((num_frames, num_bins))
    eps = float(np.finfo(np.float32).eps)
    for f in range(num_frames):
        frame = wave[f * window_shift: f * window_shift + window_size].copy()
        frame -= frame.sum() / window_size          # remove_dc_offset
        if preemph != 0.0:
            for i in range(window_size - 1, 0, -1):  # in-place, backwards
                frame[i] -= preemph * frame[i - 1]
            frame[0] -= preemph * frame[0]
        frame *= hann
        buf = np.zeros(padded)
        buf[:window_size] = frame
        spec = np.fft.rfft(buf)
        power = (spec.real ** 2 + spec.imag ** 2)[:num_fft_bins]
        mel_e = bank @ power
        out[f] = np.log(np.maximum(mel_e, eps))
    return out


@pytest.mark.parametrize("seed,nsamp", [(0, 16000), (1, 8240), (2, 4321)])
def test_fbank_matches_kaldi_oracle(seed, nsamp):
    rng = np.random.RandomState(seed)
    wave = (rng.randn(nsamp) * 0.1).astype(np.float32)
    want = kaldi_fbank_oracle(wave)
    got = np.asarray(fbank(jnp.asarray(wave)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_fbank_tone_matches_oracle():
    # a pure tone exercises the mel-edge geometry hard: energy concentrates
    # in 1-2 fft bins so any triangle mis-alignment shifts the peak bin
    t = np.arange(16000) / 16000.0
    wave = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    want = kaldi_fbank_oracle(wave)
    got = np.asarray(fbank(jnp.asarray(wave)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)
    assert int(np.argmax(got.mean(0))) == int(np.argmax(want.mean(0)))


def test_fbank_silence_hits_log_floor():
    wave = np.zeros(8000, np.float32)
    want = kaldi_fbank_oracle(wave)
    got = np.asarray(fbank(jnp.asarray(wave)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert np.allclose(got, np.log(np.finfo(np.float32).eps))


def test_fbank_fixed_length_normalization_matches():
    rng = np.random.RandomState(3)
    wave = (rng.randn(3 * 16000) * 0.05).astype(np.float32)
    raw = kaldi_fbank_oracle(wave)
    target, mean, std = 512, -4.2677393, 4.5689974
    padded = np.zeros((target, raw.shape[1]))
    padded[: min(target, raw.shape[0])] = raw[:target]
    want = (padded - mean) / std
    got = np.asarray(fbank_fixed_length(jnp.asarray(wave), target_length=target))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_fbank_rejects_subwindow_waveform():
    """A clip shorter than one 25 ms window must raise (torchaudio
    parity), not silently produce a [B, 0, mel] map that fixed-length
    padding turns into constant features."""
    import pytest

    from vitlens_tpu.ops.fbank import fbank

    with pytest.raises(ValueError, match="too short"):
        fbank(jnp.zeros((2, 399), jnp.float32))
