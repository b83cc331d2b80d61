"""Kaldi-compatible log-mel filterbank, in JAX.

On-device replacement for the reference's torchaudio.compliance.kaldi.fbank
call (/root/reference/vitlens/src/open_clip/modal_audio/processors/
at_processor.py:388-406: htk_compat=True, hanning window, 16 kHz, 128 mel
bins, 10 ms shift, dither 0, use_energy False). Moving the fbank onto the
TPU removes the dominant host-side preprocessing cost (SURVEY §7 "push fbank
on-device").

Numerics follow the Kaldi pipeline exactly:
  frames (25 ms window / 10 ms shift, snip_edges) -> remove DC offset ->
  preemphasis 0.97 (replicated first sample) -> hann window (periodic=False)
  -> zero-pad to 512-point FFT -> power spectrum -> triangular mel bank
  (mel = 1127 ln(1+f/700), low 20 Hz, high nyquist) -> log(max(e, eps)).

htk_compat only reorders the energy bin, which is unused (use_energy=False).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPS_F32 = float(np.finfo(np.float32).eps)  # Kaldi's log floor


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    num_bins: int,
    padded_window: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi MelBanks weights, [num_bins, padded_window // 2]."""
    if high_freq <= 0.0:
        high_freq = sample_freq / 2 + high_freq
    num_fft_bins = padded_window // 2

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    fft_bin_width = sample_freq / padded_window
    freqs = mel(fft_bin_width * np.arange(num_fft_bins))  # [F]

    left = mel_low + np.arange(num_bins)[:, None] * delta
    center = left + delta
    right = center + delta
    up = (freqs[None, :] - left) / delta
    down = (right - freqs[None, :]) / delta
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann(window_size: int) -> np.ndarray:
    n = np.arange(window_size)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / (window_size - 1))).astype(np.float32)


def fbank(
    waveform: jnp.ndarray,
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> jnp.ndarray:
    """waveform [T] or [B, T] -> log-mel [frames, mel] or [B, frames, mel]."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    B, T = waveform.shape
    win = int(sample_frequency * frame_length_ms / 1000)
    shift = int(sample_frequency * frame_shift_ms / 1000)
    padded = _next_pow2(win)
    num_frames = 1 + (T - win) // shift  # snip_edges=True
    if num_frames <= 0:
        # torchaudio's kaldi.fbank raises here too; silently returning
        # [B, 0, mel] would let fbank_fixed_length zero-pad a truncated/
        # corrupt clip into a constant feature map the model then encodes
        raise ValueError(
            f"waveform too short for one {frame_length_ms:g} ms window: "
            f"T={T} samples < win={win} at {sample_frequency:g} Hz")

    x = waveform.astype(jnp.float32)
    # strided frames [B, num_frames, win] WITHOUT a gather: with
    # g = gcd(win, shift) every frame row is g-aligned, so framing is
    # win/g static strided slices over the [B, T/g, g] view — pure layout
    # ops. Measured on-chip (scripts/bench_fbank_framing.py, B=64 AST
    # shapes): 4.59 vs 4.98 ms/iter for the gather — a modest 8.6% (this
    # 2D-iota gather does NOT hit the worst-case ~1.1 us/row serial
    # lowering of the grouping gathers), but the sliced form is static,
    # fusion-friendly, and never risks that cliff at other geometries.
    g = math.gcd(win, shift)
    nslices = win // g
    if nslices <= 64:
        t_need = shift * (num_frames - 1) + win  # multiple of g
        base = x[:, :t_need].reshape(B, t_need // g, g)
        s = shift // g
        parts = [
            jax.lax.slice_in_dim(base, k, k + s * (num_frames - 1) + 1, s,
                                 axis=1)
            for k in range(nslices)
        ]  # each [B, num_frames, g]
        frames = jnp.stack(parts, axis=2).reshape(B, num_frames, win)
    else:  # pathological window/shift ratio: fall back to the gather
        idx = (jnp.arange(num_frames) * shift)[:, None] \
            + jnp.arange(win)[None, :]
        frames = x[:, idx]

    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_hann(win))

    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # [B, F, padded/2+1]
    power = power[..., : padded // 2]  # mel bank covers bins [0, N/2)

    weights = jnp.asarray(
        mel_filterbank(num_mel_bins, padded, sample_frequency, low_freq, high_freq)
    )
    energies = power @ weights.T  # [B, frames, mel]
    out = jnp.log(jnp.maximum(energies, EPS_F32))
    return out[0] if squeeze else out


def fbank_fixed_length(
    waveform: jnp.ndarray,
    target_length: int = 512,
    mean: float = -4.2677393,
    std: float = 4.5689974,
    **kwargs,
) -> jnp.ndarray:
    """fbank + pad/trim to `target_length` frames + AST normalization
    (reference at_processor.py: ZeroPad2d tail pad / head trim, then
    Normalize(mean=-4.268, std=4.569))."""
    fb = fbank(waveform, **kwargs)
    squeeze = fb.ndim == 2
    if squeeze:
        fb = fb[None]
    n = fb.shape[1]
    if n < target_length:
        fb = jnp.pad(fb, ((0, 0), (0, target_length - n), (0, 0)))
    elif n > target_length:
        fb = fb[:, :target_length]
    fb = (fb - mean) / std
    return fb[0] if squeeze else fb
