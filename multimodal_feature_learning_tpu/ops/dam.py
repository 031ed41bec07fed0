"""Decoder Attention Map (DAM) utilities for Sparse-DETR token supervision.

Behavioral spec: reference ``utils/dam.py:12-93``.  ``attn_map_to_flat_grid``
splats each decoder sampling location's attention weight onto the two nearest
tokens of the flattened multi-level grid with linear margins.

Parity note: the reference computes the margins with ``.prod(dim=-1)`` over a
trailing singleton dim (the 1-D lift of the 2-D Sparse-DETR code), so the
"start"-tap margin is ``frac - 1`` (negative) rather than ``1 - frac``.  The
mask-prediction loss target is a top-k over this grid, so we reproduce the
formula exactly as executed, sign and all.
"""

from __future__ import annotations

import jax.numpy as jnp


def idx_to_flat_grid(total_tokens: int, idx: jnp.ndarray) -> jnp.ndarray:
    """One-hot scatter of token indices. idx: (B, K) -> (B, total_tokens)."""
    B = idx.shape[0]
    flat = jnp.zeros((B, total_tokens), dtype=jnp.float32)
    rows = jnp.arange(B)[:, None]
    return flat.at[rows, idx.astype(jnp.int32)].set(1.0)


def attn_map_to_flat_grid(
    temporal_shapes,
    level_start_index,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Splat decoder sampling attention onto the flattened token grid.

    Args:
      temporal_shapes: static (L,) per-level token counts.
      level_start_index: static (L,) start offset per level.
      sampling_locations: (B, num_layers, Q, H, L, P) in [0, 1].
      attention_weights: (B, num_layers, Q, H, L, P).

    Returns:
      (B, num_layers, H, S) with S = sum(temporal_shapes).
    """
    B, num_layers, Q, H, L, P = sampling_locations.shape
    shapes = jnp.asarray(temporal_shapes, dtype=jnp.float32)  # (L,)
    starts = jnp.asarray(level_start_index, dtype=jnp.int32)  # (L,)
    S = int(sum(int(t) for t in temporal_shapes))

    # (B, layers, H, Q, P, L) then flatten batch-ish dims -> (N, Q*P, L)
    loc = sampling_locations.transpose(0, 1, 3, 2, 5, 4).reshape(-1, Q * P, L)
    w = attention_weights.transpose(0, 1, 3, 2, 5, 4).reshape(-1, Q * P, L)
    N = loc.shape[0]

    tid_float = loc * shapes  # (N, QP, L)
    tid_start = jnp.floor(tid_float).astype(jnp.int32)
    tid_end = tid_start + 1
    margin_start = tid_float - tid_start  # frac, in [0, 1)
    margin_end = tid_float - tid_end  # frac - 1, in [-1, 0)  (see docstring)

    flat = jnp.zeros((N, S), dtype=jnp.float32)
    rows = jnp.arange(N)[:, None]
    for tid, margin in ((tid_start, margin_end), (tid_end, margin_start)):
        valid = (tid >= 0) & (tid < shapes.astype(jnp.int32))
        idx = (tid + starts) * valid  # invalid -> 0, weight zeroed below
        weights = (w * valid * margin).reshape(N, -1)
        flat = flat.at[rows, idx.reshape(N, -1)].add(weights)

    return flat.reshape(B, num_layers, H, S)


def compute_corr(flat_grid_topk, flat_grid_attn_map, temporal_shapes):
    """Coverage diagnostic: fraction of decoder attention mass landing on the
    tokens kept by the encoder top-k. Reference utils/dam.py:76-93."""
    if flat_grid_topk.ndim == 1:
        flat_grid_topk = flat_grid_topk[None]
        flat_grid_attn_map = flat_grid_attn_map[None]

    tot = flat_grid_attn_map.sum(-1)
    hit = (flat_grid_topk * flat_grid_attn_map).sum(-1)
    corr = [hit / tot]
    idx = 0
    for shape in temporal_shapes:
        shape = int(shape)
        sl = slice(idx, idx + shape)
        tot_l = flat_grid_attn_map[:, sl].sum(-1)
        hit_l = (flat_grid_topk[:, sl] * flat_grid_attn_map[:, sl]).sum(-1)
        idx += shape
        corr.append(hit_l / tot_l)
    return corr
