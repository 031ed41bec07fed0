"""1-D temporal segment geometry (pure jnp).

Behavioral spec: reference ``utils/box_ops.py:3-70`` — (center, length) <->
(start, end) conversion, pairwise IoU and generalized IoU with the same 1e-5
epsilon.  Unlike the reference (which asserts on degenerate segments), these
are total functions: under ``jit`` we cannot raise, so degenerate inputs just
flow through the same clamped arithmetic.
"""

import jax.numpy as jnp


def segment_cl_to_xy(x: jnp.ndarray) -> jnp.ndarray:
    """(center, length) -> (start, end). Last dim must be 2."""
    c, l = x[..., 0], x[..., 1]
    return jnp.stack([c - 0.5 * l, c + 0.5 * l], axis=-1)


def segment_xy_to_cl(x: jnp.ndarray) -> jnp.ndarray:
    """(start, end) -> (center, length). Last dim must be 2."""
    s, e = x[..., 0], x[..., 1]
    return jnp.stack([(s + e) / 2, e - s], axis=-1)


def box_iou(segment1: jnp.ndarray, segment2: jnp.ndarray):
    """Pairwise IoU of 1-D segments in (start, end) format.

    segment1: (N, 2), segment2: (M, 2) -> iou, union each (N, M).
    Matches reference utils/box_ops.py:34-47 (epsilon 1e-5 in denominator).
    """
    area1 = segment1[:, 1] - segment1[:, 0]  # (N,)
    area2 = segment2[:, 1] - segment2[:, 0]  # (M,)

    lt = jnp.maximum(segment1[:, None, 0], segment2[None, :, 0])  # (N, M)
    rb = jnp.minimum(segment1[:, None, 1], segment2[None, :, 1])  # (N, M)

    inter = jnp.clip(rb - lt, min=0)
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / (union + 1e-5)
    return iou, union


def generalized_box_iou(segment1: jnp.ndarray, segment2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU (https://giou.stanford.edu/) of 1-D segments.

    segment1: (N, 2), segment2: (M, 2) in (start, end) format -> (N, M).
    Matches reference utils/box_ops.py:50-70.
    """
    iou, union = box_iou(segment1, segment2)
    lt = jnp.minimum(segment1[:, None, 0], segment2[None, :, 0])
    rb = jnp.maximum(segment1[:, None, 1], segment2[None, :, 1])
    area = jnp.clip(rb - lt, min=0)
    return iou - (area - union) / (area + 1e-5)


def denormalize_segments(
    segments: jnp.ndarray, durations: jnp.ndarray
) -> jnp.ndarray:
    """(center, length) normalized -> (start, end) seconds, clamped to [0, dur]
    and order-fixed.  Vectorized port of reference
    utils/preds_postprocess.py:54-80 (which loops per proposal on the host).

    segments: (..., 2); durations broadcastable to segments[..., 0].
    """
    c, l = segments[..., 0], segments[..., 1]
    d = durations
    start = jnp.clip(d / 2 * (2 * c - l), 0.0, d)
    end = jnp.clip(d / 2 * (2 * c + l), 0.0, d)
    return jnp.stack([jnp.minimum(start, end), jnp.maximum(start, end)], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with clamping; matches reference models/modules/misc_modules.py:29-33."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1 / x2)
