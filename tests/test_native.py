"""Native C++ collate library vs numpy reference (builds with make on first use)."""

import numpy as np
import pytest

from multimodal_feature_learning_tpu import native
from multimodal_feature_learning_tpu.data.anet import nearest_resize


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_resize_f32_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 37, 8)).astype(np.float32)
    for t_out in (300, 37, 13, 1):
        expected = nearest_resize(x, t_out)
        got = native.resize_nearest(x, t_out)
        np.testing.assert_array_equal(got, expected)


def test_resize_bool_matches_numpy(lib_ok):
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(5, 23)) > 0.5
    for t_out in (50, 23, 7):
        expected = nearest_resize(x, t_out)
        got = native.resize_nearest(x, t_out)
        np.testing.assert_array_equal(got, expected)


def test_pad_resize_batch_matches_reference_collate(lib_ok):
    rng = np.random.default_rng(2)
    feats = [rng.normal(size=(n, 6)).astype(np.float32) for n in (10, 25, 17)]
    t_out = 30
    got, got_mask = native.pad_resize_batch(feats, t_out)

    # reference semantics: pad to batch max, then nearest-resize tensor + mask
    max_len = max(f.shape[0] for f in feats)
    padded = np.zeros((3, max_len, 6), dtype=np.float32)
    mask = np.ones((3, max_len), dtype=bool)
    for i, f in enumerate(feats):
        padded[i, : f.shape[0]] = f
        mask[i, : f.shape[0]] = False
    expected = nearest_resize(padded, t_out)
    expected_mask = nearest_resize(mask, t_out)
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(got_mask, expected_mask)
