"""Audio fbank + video transform frontends: physics/geometry sanity tests
(no torchaudio/torchvision in the image, so oracles are analytic)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.data.audio import (
    aframes_to_fbank,
    fbank,
    inverse_mel_scale,
    mel_banks,
    mel_scale,
)
from multimodal_feature_learning_tpu.data.video_transforms import (
    center_crop,
    normalize,
    preprocess_clip,
    resize_short_side,
    temporal_resample_nearest,
)


def test_mel_scale_roundtrip():
    freqs = np.array([20.0, 440.0, 4000.0, 7999.0])
    np.testing.assert_allclose(inverse_mel_scale(mel_scale(freqs)), freqs, rtol=1e-6)


def test_mel_banks_partition():
    banks = mel_banks(40, 512, 16000.0)
    assert banks.shape == (40, 256)
    # interior FFT bins are covered by at most 2 overlapping triangles that sum <= 1
    col = banks.sum(axis=0)
    assert col.max() <= 1.0 + 1e-5
    # every filter has positive mass
    assert (banks.sum(axis=1) > 0).all()


def test_fbank_tone_peaks_at_expected_mel_bin():
    sr = 16000.0
    t = np.arange(int(sr * 0.5)) / sr
    for tone in (300.0, 1000.0, 3000.0):
        wave = np.sin(2 * np.pi * tone * t).astype(np.float32)
        fb = np.asarray(fbank(jnp.asarray(wave), sr, num_mel_bins=80))
        assert fb.shape[1] == 80
        mean_energy = fb.mean(axis=0)
        peak_bin = mean_energy.argmax()
        # expected bin: mel position of the tone within [mel(20), mel(nyq)]
        mel_low, mel_high = mel_scale(20.0), mel_scale(8000.0)
        expected = (mel_scale(tone) - mel_low) / (mel_high - mel_low) * 81 - 1
        assert abs(peak_bin - expected) <= 2, (tone, peak_bin, expected)


def test_fbank_frame_count_and_target_padding():
    sr = 16000.0
    wave = jnp.asarray(np.random.default_rng(0).normal(size=int(sr * 0.3)).astype(np.float32))
    fb = fbank(wave, sr, num_mel_bins=32)
    # snip_edges: 1 + (4800 - 400) // 160 = 28 frames
    assert fb.shape == (28, 32)
    out = aframes_to_fbank(wave, sr, 32, target_length=64)
    assert out.shape == (64, 32)
    np.testing.assert_allclose(np.asarray(out[28:]), 0.0)  # zero-padded tail
    out_cut = aframes_to_fbank(wave, sr, 32, target_length=10)
    assert out_cut.shape == (10, 32)


def test_video_transforms_geometry():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(4, 240, 320, 3)).astype(np.uint8))
    resized = resize_short_side(frames, 256)
    assert resized.shape == (4, 256, 341, 3)
    cropped = center_crop(resized, 224)
    assert cropped.shape == (4, 224, 224, 3)
    out = normalize(cropped)
    assert out.dtype == jnp.float32
    # gray value 128 -> (128/255 - mean)/std per channel
    gray = normalize(jnp.full((1, 2, 2, 3), 128, dtype=jnp.uint8))
    expected = (128 / 255 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(gray[0, 0, 0]), expected, rtol=1e-5)


def test_preprocess_clip_jits():
    frames = jnp.zeros((4, 240, 320, 3), dtype=jnp.uint8)
    f = jax.jit(lambda x, r: preprocess_clip(x, train=True, rng=r))
    out = f(frames, jax.random.PRNGKey(0))
    assert out.shape == (4, 224, 224, 3)


def test_temporal_resample():
    frames = jnp.arange(10)[:, None, None, None] * jnp.ones((10, 2, 2, 3))
    out = temporal_resample_nearest(frames, 5)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0]), [0, 2, 4, 7, 9])
