"""Static-shape fbank (dataloader path) must equal the dynamic-shape one.

The raw ingest previously traced/compiled a fresh fbank per distinct wave
length (one recompile per video); aframes_to_fbank_static fixes the input
length to window + (target_length-1)*shift samples. Each fbank frame only
sees its own window (DC removal and preemphasis are frame-local) and the
global mean is subtracted before truncation, so the two must agree exactly
for every wave-length regime."""

import numpy as np
import pytest

from multimodal_feature_learning_tpu.data.audio import (
    aframes_to_fbank,
    aframes_to_fbank_static,
)

SR = 16000.0
MEL = 16
TARGET = 64
N_NEEDED = 400 + 63 * 160  # window + (target-1)*shift at 16 kHz


@pytest.mark.parametrize(
    "n_samples",
    [
        N_NEEDED * 3,      # long clip: fbank cut to target_length
        N_NEEDED,          # exactly the needed span
        N_NEEDED - 1,      # one frame short -> last frame zero-padded
        5000,              # much shorter: most frames padded
        399,               # shorter than one window -> all zeros
    ],
)
def test_static_matches_dynamic(n_samples):
    rng = np.random.default_rng(n_samples)
    wave = rng.normal(size=n_samples).astype(np.float32)
    dyn = np.asarray(aframes_to_fbank(wave, SR, MEL, TARGET))
    stat = aframes_to_fbank_static(wave, SR, MEL, TARGET)
    np.testing.assert_allclose(stat, dyn, rtol=0, atol=1e-5)
    assert stat.shape == (TARGET, MEL)


def test_static_single_compile():
    """Different wave lengths must reuse one jitted program (the whole point)."""
    from multimodal_feature_learning_tpu.data.audio import _fbank_fixed

    _fbank_fixed.cache_clear()
    rng = np.random.default_rng(0)
    for n in (N_NEEDED * 2, 7777, 50000):
        aframes_to_fbank_static(rng.normal(size=n).astype(np.float32), SR, MEL, TARGET)
    info = _fbank_fixed.cache_info()
    assert info.misses == 1 and info.hits == 2
