"""Parity test for attn_map_to_flat_grid vs a direct numpy evaluation of the
reference formula (utils/dam.py:20-73), including its 1-D-lift margin signs."""

import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.ops import attn_map_to_flat_grid, idx_to_flat_grid

SHAPES = (8, 4, 2)
STARTS = (0, 8, 12)


def numpy_oracle(loc, aw):
    B, layers, Q, H, L, P = loc.shape
    S = sum(SHAPES)
    loc2 = loc.transpose(0, 1, 3, 2, 5, 4).reshape(-1, Q * P, L)
    aw2 = aw.transpose(0, 1, 3, 2, 5, 4).reshape(-1, Q * P, L)
    N = loc2.shape[0]
    shapes = np.array(SHAPES, dtype=np.float64)
    starts = np.array(STARTS)
    tid_float = loc2 * shapes
    tid_start = np.floor(tid_float).astype(np.int64)
    tid_end = tid_start + 1
    margin_start = tid_float - tid_start
    margin_end = tid_float - tid_end
    flat = np.zeros((N, S))
    for tid, margin in ((tid_start, margin_end), (tid_end, margin_start)):
        valid = (tid >= 0) & (tid < shapes.astype(np.int64))
        idx = (tid + starts) * valid
        weights = aw2 * valid * margin
        for n in range(N):
            np.add.at(flat[n], idx[n].ravel(), weights[n].ravel())
    return flat.reshape(B, layers, H, S)


def test_attn_map_to_flat_grid():
    rng = np.random.default_rng(0)
    B, layers, Q, H, L, P = 2, 3, 5, 2, 3, 4
    loc = rng.uniform(-0.1, 1.1, size=(B, layers, Q, H, L, P)).astype(np.float32)
    aw = rng.uniform(size=(B, layers, Q, H, L, P)).astype(np.float32)
    expected = numpy_oracle(loc, aw)
    got = attn_map_to_flat_grid(SHAPES, STARTS, jnp.asarray(loc), jnp.asarray(aw))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_idx_to_flat_grid():
    idx = jnp.array([[0, 3, 3], [1, 2, 5]])
    out = np.asarray(idx_to_flat_grid(6, idx))
    assert out.shape == (2, 6)
    np.testing.assert_allclose(out[0], [1, 0, 0, 1, 0, 0])
    np.testing.assert_allclose(out[1], [0, 1, 1, 0, 0, 1])
