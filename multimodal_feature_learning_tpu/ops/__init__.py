"""Core numeric ops: segment geometry, deformable attention, LAP matching, DAM."""

from .segment_ops import (  # noqa: F401
    segment_cl_to_xy,
    segment_xy_to_cl,
    box_iou,
    generalized_box_iou,
    inverse_sigmoid,
)
from .ms_deform_attn import (  # noqa: F401
    ms_deform_attn_core,
    ms_deform_attn,
)
from .hungarian import hungarian, batched_hungarian  # noqa: F401
from .dam import attn_map_to_flat_grid, idx_to_flat_grid, compute_corr  # noqa: F401
