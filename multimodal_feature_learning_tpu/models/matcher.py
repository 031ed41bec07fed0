"""Set matcher: DETR-style Hungarian assignment, fully on-device.

Behavioral spec: reference ``models/matcher.py:42-94`` — cost =
cost_segment * L1(center,length) + cost_giou * (-gIoU), solved with LSAP per
batch element (the class cost is computed but unused in the reference, so it
is omitted).  Instead of a GPU->CPU sync + scipy per sample, costs are built
over the fixed (num_queries x max_gt) grid and solved with the jit-able
``ops.hungarian``; padded GT columns are masked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.hungarian import batched_hungarian
from ..ops.segment_ops import generalized_box_iou, segment_cl_to_xy


@functools.partial(jax.jit, static_argnames=("cost_segment", "cost_giou"))
def hungarian_match(
    pred_segments: jnp.ndarray,  # (B, Q, 2) (center, length), sigmoided
    gt_segments: jnp.ndarray,    # (B, G, 2) (center, length), normalized
    gt_mask: jnp.ndarray,        # (B, G) bool True=valid
    cost_segment: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    """Returns col_to_row (B, G) int32: GT slot j -> matched query index.
    Entries at invalid GT slots are arbitrary (mask with gt_mask)."""
    l1 = jnp.abs(pred_segments[:, :, None, :] - gt_segments[:, None, :, :]).sum(-1)
    giou = jax.vmap(generalized_box_iou)(
        segment_cl_to_xy(pred_segments), segment_cl_to_xy(gt_segments)
    )  # (B, Q, G)
    cost = cost_segment * l1 - cost_giou * giou
    # guard NaNs (degenerate segments) so the LAP stays well-posed
    cost = jnp.nan_to_num(cost, nan=1e5, posinf=1e5, neginf=-1e5)
    return batched_hungarian(cost, gt_mask)
