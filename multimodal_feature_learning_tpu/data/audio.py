"""Kaldi-compatible log-mel filterbank features in JAX.

Behavioral spec: the reference's audio frontend
(``models/modules/misc_modules.py:110-132``):
``torchaudio.compliance.kaldi.fbank(htk_compat=True, use_energy=False,
window_type='hanning', num_mel_bins=128, dither=0.0, frame_shift=10)`` applied
to a mean-subtracted waveform, then cut/zero-padded to ``target_length``
frames.  That call implements Kaldi's fbank pipeline, re-derived here from the
Kaldi algorithm (snip-edges framing, per-frame DC removal, 0.97 preemphasis,
Hanning window, power FFT padded to a power of two, triangular mel banks on
mel(f) = 1127 ln(1 + f/700), natural-log energies floored at eps).

Everything is pure jnp: the whole audio frontend jits and can fuse with the
encoder — the reference runs it per-sample on the CPU dataloader workers.
"""

from __future__ import annotations

import functools as _functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # float32 eps, Kaldi's log floor


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_banks(
    num_bins: int,
    window_length_padded: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """(num_bins, num_fft_bins) triangular mel filterbank, Kaldi semantics."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins), dtype=np.float32)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        for i in range(num_fft_bins):
            mel = mel_scale(fft_bin_width * i)
            if left < mel < right:
                if mel <= center:
                    bins[b, i] = (mel - left) / (center - left)
                else:
                    bins[b, i] = (right - mel) / (right - center)
    return bins


def fbank(
    waveform: jnp.ndarray,       # (num_samples,) or (1, num_samples)
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
) -> jnp.ndarray:
    """Log-mel filterbank energies, (num_frames, num_mel_bins)."""
    waveform = waveform.reshape(-1)
    window_size = int(sample_frequency * frame_length_ms / 1000)
    window_shift = int(sample_frequency * frame_shift_ms / 1000)
    padded = _next_pow2(window_size)
    n = waveform.shape[0]
    num_frames = max(1 + (n - window_size) // window_shift, 0)  # snip_edges

    idx = (
        jnp.arange(num_frames)[:, None] * window_shift
        + jnp.arange(window_size)[None, :]
    )
    frames = waveform[idx]  # (F, W)

    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis_coefficient:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis_coefficient * prev

    # Kaldi 'hanning': 0.5 - 0.5 cos(2 pi n / (N-1))
    window = 0.5 - 0.5 * jnp.cos(
        2 * math.pi * jnp.arange(window_size) / (window_size - 1)
    )
    frames = frames * window

    frames = jnp.pad(frames, ((0, 0), (0, padded - window_size)))
    spectrum = jnp.abs(jnp.fft.rfft(frames, axis=1)) ** 2  # (F, padded//2+1)
    spectrum = spectrum[:, : padded // 2]  # Kaldi drops the nyquist bin for mel

    banks = jnp.asarray(mel_banks(num_mel_bins, padded, sample_frequency))
    mel_energies = spectrum @ banks.T  # (F, num_mel_bins)
    return jnp.log(jnp.maximum(mel_energies, EPSILON))


def aframes_to_fbank(
    aframes: jnp.ndarray,
    sample_frequency: float,
    num_mel_bins: int,
    target_length: int,
) -> jnp.ndarray:
    """Reference misc_modules.py:110-132: global mean subtraction, fbank,
    cut/zero-pad to target_length frames. Returns (target_length, num_mel_bins)."""
    aframes = aframes.reshape(-1)
    aframes = aframes - aframes.mean()
    fb = fbank(aframes, sample_frequency, num_mel_bins)
    n = fb.shape[0]
    if n >= target_length:
        return fb[:target_length]
    return jnp.pad(fb, ((0, target_length - n), (0, 0)))


@_functools.lru_cache(maxsize=8)
def _fbank_fixed(n_samples: int, sample_frequency: float, num_mel_bins: int):
    """One jitted fbank per fixed input length — the static-shape companion
    of aframes_to_fbank for the per-sample dataloader path."""
    del n_samples  # cache key only: all calls through one entry share a shape
    return jax.jit(lambda w: fbank(w, sample_frequency, num_mel_bins))


def aframes_to_fbank_static(
    aframes: np.ndarray,
    sample_frequency: float,
    num_mel_bins: int,
    target_length: int,
) -> np.ndarray:
    """Static-shape aframes_to_fbank for the host dataloader.

    The dynamic version traces/compiles a fresh XLA program per distinct wave
    length — every ActivityNet clip has a unique duration, so the raw ingest
    path recompiled (and shipped the full waveform to the device) once *per
    video*. Only the first ``window + (target_length-1)*shift`` samples can
    influence the cut-to-target_length output, and each fbank frame sees only
    its own window (DC removal and preemphasis are frame-local), so:
    subtract the full-wave mean on the host (reference semantics,
    misc_modules.py:118), truncate/zero-pad the wave to that fixed sample
    count (one compile total), and zero out frames past the true frame count
    to reproduce the dynamic version's zero-padding. Numerically identical to
    aframes_to_fbank for every wave length (tests/test_audio_static.py; the
    only difference source is the host-vs-device full-wave mean reduction).
    """
    wave = np.asarray(aframes, dtype=np.float32).reshape(-1)
    window_size = int(sample_frequency * 25.0 / 1000)
    window_shift = int(sample_frequency * 10.0 / 1000)
    n_needed = window_size + (target_length - 1) * window_shift
    n = wave.shape[0]
    num_valid = min(max(1 + (n - window_size) // window_shift, 0), target_length)
    if n:
        wave = wave - wave.mean()
    if n >= n_needed:
        wave = wave[:n_needed]
    else:
        wave = np.pad(wave, (0, n_needed - n))
    fn = _fbank_fixed(n_needed, float(sample_frequency), int(num_mel_bins))
    fb = np.array(fn(jnp.asarray(wave)))  # (target_length, num_mel_bins), writable
    if num_valid < target_length:
        fb[num_valid:] = 0.0
    return fb
