import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.ops import (
    box_iou,
    generalized_box_iou,
    inverse_sigmoid,
    segment_cl_to_xy,
    segment_xy_to_cl,
)


def test_cl_xy_roundtrip():
    rng = np.random.default_rng(0)
    cl = rng.uniform(0.1, 0.9, size=(17, 2)).astype(np.float32)
    xy = segment_cl_to_xy(jnp.asarray(cl))
    back = segment_xy_to_cl(xy)
    np.testing.assert_allclose(np.asarray(back), cl, rtol=1e-6, atol=1e-6)


def test_cl_to_xy_hand_case():
    out = segment_cl_to_xy(jnp.array([[0.5, 0.2]]))
    np.testing.assert_allclose(np.asarray(out), [[0.4, 0.6]], atol=1e-7)


def test_iou_hand_cases():
    a = jnp.array([[0.0, 1.0]])
    b = jnp.array([[0.5, 1.5], [2.0, 3.0]])
    iou, union = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0, 0]), 0.5 / (1.5 + 1e-5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(iou[0, 1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(union[0]), [1.5, 2.0], rtol=1e-6)


def test_giou_vs_torch_reference():
    """Compare against the reference formula computed with numpy directly."""
    rng = np.random.default_rng(1)
    starts = rng.uniform(0, 0.5, size=(11, 1))
    lens = rng.uniform(0.05, 0.5, size=(11, 1))
    seg1 = np.concatenate([starts, starts + lens], -1).astype(np.float32)
    starts2 = rng.uniform(0, 0.5, size=(7, 1))
    lens2 = rng.uniform(0.05, 0.5, size=(7, 1))
    seg2 = np.concatenate([starts2, starts2 + lens2], -1).astype(np.float32)

    # numpy port of utils/box_ops.py:50-70
    area1 = seg1[:, 1] - seg1[:, 0]
    area2 = seg2[:, 1] - seg2[:, 0]
    lt = np.maximum(seg1[:, None, 0], seg2[None, :, 0])
    rb = np.minimum(seg1[:, None, 1], seg2[None, :, 1])
    inter = np.clip(rb - lt, 0, None)
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / (union + 1e-5)
    lt2 = np.minimum(seg1[:, None, 0], seg2[None, :, 0])
    rb2 = np.maximum(seg1[:, None, 1], seg2[None, :, 1])
    area = np.clip(rb2 - lt2, 0, None)
    expected = iou - (area - union) / (area + 1e-5)

    got = generalized_box_iou(jnp.asarray(seg1), jnp.asarray(seg2))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_inverse_sigmoid():
    x = jnp.array([0.0, 1e-9, 0.5, 1.0 - 1e-9, 1.0])
    y = np.asarray(inverse_sigmoid(x))
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y[2], 0.0, atol=1e-6)
    # clamped extremes: log(eps/(1-eps)) with eps=1e-5
    np.testing.assert_allclose(y[0], np.log(1e-5 / (1 - 1e-5)), rtol=1e-5)
