"""1-D multi-scale deformable attention — TPU-native.

Behavioral spec: the reference's live pure-torch core
(``models/modules/attention.py:331-383``): per query, per head, per feature
level, sample the flattened value tensor at P continuous temporal locations
with linear interpolation (the 1-D degenerate case of
``F.grid_sample(mode='bilinear', padding_mode='border', align_corners=False)``
on a (1, T) grid with grid coordinate ``2*loc - 1``), then weighted-sum with
softmaxed attention weights.  The reference's CUDA op
(``models/ops/src/cuda/ms_deform_im2col_cuda.cuh``) is the same computation;
here it is re-designed for TPU rather than translated:

Backends
  * ``gather``   — tier-1 jnp oracle: vectorized take_along_axis gathers.
                   Ground truth for all parity tests; fine on CPU.
  * ``matmul``   — tier-2 XLA path: reformulates the sample-and-accumulate as
                   a dense (Q, S) x (S, Dh) matmul per (batch, head), where the
                   (Q, S) "splat" matrix carries interpolation x attention
                   weights built from one-hot comparisons.  This maps the hot
                   loop onto the MXU (systolic array) instead of scalar
                   gathers, and is differentiable for free.
  * ``pallas``   — tier-3 fused Pallas kernel (see ``pallas_msda.py``):
                   the matmul formulation fused into VMEM tiles so the splat
                   matrix never materializes in HBM.

grid_sample semantics note: with ``align_corners=False`` the unnormalized
coordinate is ``x = loc * T - 0.5``; with border padding both interpolation
taps clamp to the same edge pixel whenever x leaves [0, T-1], which is
equivalent to clamping x itself first.  We clamp x first (cheaper).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _level_splits(temporal_shapes: Sequence[int]):
    """Static (start, length) pairs for each level in the flattened token axis."""
    starts, cur = [], 0
    for t in temporal_shapes:
        starts.append(cur)
        cur += int(t)
    return starts, cur


# ---------------------------------------------------------------------------
# tier 1: gather oracle
# ---------------------------------------------------------------------------

def _sample_level_gather(value_l, loc_l, T):
    """Linear-interp sample of one level.

    value_l: (B, T, H, Dh); loc_l: (B, Q, H, P) in [0, 1] (may exceed).
    Returns (B, Q, H, P, Dh).
    """
    x = loc_l * T - 0.5
    x = jnp.clip(x, 0.0, T - 1.0)  # border padding (see module docstring)
    x0 = jnp.floor(x)
    w1 = x - x0
    w0 = 1.0 - w1
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)

    B, Q, H, P = loc_l.shape
    # (B, T, H, Dh) -> (B, H, T, Dh) for take_along_axis over the token axis
    v = jnp.swapaxes(value_l, 1, 2)
    idx = jnp.stack([i0, i1], axis=0)  # (2, B, Q, H, P)
    idx = idx.transpose(1, 3, 0, 2, 4).reshape(B, H, 2 * Q * P)  # (B, H, 2QP)
    g = jnp.take_along_axis(v, idx[..., None], axis=2)  # (B, H, 2QP, Dh)
    g = g.reshape(B, H, 2, Q, P, -1)
    v0, v1 = g[:, :, 0], g[:, :, 1]  # (B, H, Q, P, Dh)
    w0 = w0.transpose(0, 2, 1, 3)[..., None]  # (B, H, Q, P, 1)
    w1 = w1.transpose(0, 2, 1, 3)[..., None]
    out = v0 * w0 + v1 * w1  # (B, H, Q, P, Dh)
    return out.transpose(0, 2, 1, 3, 4)  # (B, Q, H, P, Dh)


def _core_gather(value, temporal_shapes, sampling_locations, attention_weights):
    starts, total = _level_splits(temporal_shapes)
    B, S, H, Dh = value.shape
    assert S == total, f"value token axis {S} != sum(temporal_shapes) {total}"
    out = jnp.zeros(sampling_locations.shape[:3] + (Dh,), dtype=value.dtype)
    for l, (start, T) in enumerate(zip(starts, temporal_shapes)):
        value_l = jax.lax.dynamic_slice_in_dim(value, start, int(T), axis=1)
        sampled = _sample_level_gather(
            value_l, sampling_locations[:, :, :, l, :], int(T)
        )  # (B, Q, H, P, Dh)
        w = attention_weights[:, :, :, l, :, None]  # (B, Q, H, P, 1)
        out = out + jnp.sum(sampled * w, axis=3)
    return out.reshape(out.shape[0], out.shape[1], H * Dh)


# ---------------------------------------------------------------------------
# tier 2: one-hot matmul (MXU) formulation
# ---------------------------------------------------------------------------

def _splat_pieces(temporal_shapes, sampling_locations, attention_weights, dtype):
    """Per-level (B, H, Q, T_l) interpolation x attention weight blocks."""
    pieces = []
    for l, T in enumerate(temporal_shapes):
        T = int(T)
        loc = sampling_locations[:, :, :, l, :].transpose(0, 2, 1, 3)  # (B,H,Q,P)
        aw = attention_weights[:, :, :, l, :].transpose(0, 2, 1, 3)
        x = jnp.clip(loc * T - 0.5, 0.0, T - 1.0)
        x0 = jnp.floor(x)
        w1 = x - x0
        w0 = 1.0 - w1
        i0 = x0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, T - 1)
        toks = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, T), 4)
        contrib = (
            (i0[..., None] == toks) * (w0 * aw)[..., None]
            + (i1[..., None] == toks) * (w1 * aw)[..., None]
        )  # (B, H, Q, P, T)
        pieces.append(jnp.sum(contrib, axis=3).astype(dtype))  # (B, H, Q, T)
    return pieces


def _splat_matrix(temporal_shapes, sampling_locations, attention_weights, dtype):
    """Build the (B, H, Q, S) combined interpolation x attention weight matrix.

    out[b,h,q,s] = sum over (l, p) taps whose interpolation touches flat token
    s of attn_weight * interp_weight.  The deformable attention output is then
    a plain matmul ``splat @ value`` that runs on the MXU.

    Levels occupy disjoint slices of the flattened token axis: build each
    level's (B, H, Q, T_l) block and concatenate ONCE. (An earlier version
    accumulated into a zero buffer with dynamic_update_slice — profiling
    showed those whole-buffer updates dominating the encoder at ~1 ms each.)
    """
    return jnp.concatenate(
        _splat_pieces(temporal_shapes, sampling_locations, attention_weights, dtype),
        axis=3,
    )


def _core_matmul(value, temporal_shapes, sampling_locations, attention_weights):
    B, S, H, Dh = value.shape
    splat = _splat_matrix(
        temporal_shapes, sampling_locations, attention_weights, value.dtype
    )  # (B, H, Q, S)
    v = jnp.swapaxes(value, 1, 2)  # (B, H, S, Dh)
    # dot in operand dtype: TPU MXU accumulates bf16 x bf16 in f32 internally,
    # and forcing an f32 output here would push the backward dots to f32
    out = jnp.einsum("bhqs,bhsd->bhqd", splat, v).astype(value.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, -1, H * Dh)


def _core_matmul_acc(value, temporal_shapes, sampling_locations, attention_weights):
    """Per-level matmul accumulation variant of _core_matmul (no concatenated
    splat): out = sum_l splat_l @ value_l. Byte-profiled alternative — see
    COMPONENTS.md; the concatenated splat's layout copies vs four smaller
    dots trade within noise at production shapes."""
    B, S, H, Dh = value.shape
    pieces = _splat_pieces(
        temporal_shapes, sampling_locations, attention_weights, value.dtype
    )
    v = jnp.swapaxes(value, 1, 2)  # (B, H, S, Dh)
    out = None
    start = 0
    for p, T in zip(pieces, temporal_shapes):
        vl = jax.lax.dynamic_slice_in_dim(v, start, int(T), axis=2)
        o = jnp.einsum("bhqt,bhtd->bhqd", p, vl)
        out = o if out is None else out + o
        start += int(T)
    out = out.astype(value.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, -1, H * Dh)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("temporal_shapes", "backend"))
def ms_deform_attn_core(
    value: jnp.ndarray,
    temporal_shapes: tuple,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    backend: str = "gather",
) -> jnp.ndarray:
    """Multi-scale deformable attention core.

    Args:
      value: (B, S, H, Dh) flattened multi-level values, S = sum(temporal_shapes).
      temporal_shapes: static tuple of per-level token counts (L,).
      sampling_locations: (B, Q, H, L, P) in [0, 1] (unclamped).
      attention_weights: (B, Q, H, L, P), softmax-normalized over (L, P).
      backend: 'gather' | 'matmul' | 'pallas'.

    Returns:
      (B, Q, H * Dh).
    """
    temporal_shapes = tuple(int(t) for t in temporal_shapes)
    if backend == "gather":
        return _core_gather(value, temporal_shapes, sampling_locations, attention_weights)
    if backend == "matmul":
        return _core_matmul(value, temporal_shapes, sampling_locations, attention_weights)
    if backend == "matmul_acc":
        return _core_matmul_acc(value, temporal_shapes, sampling_locations, attention_weights)
    if backend == "pallas":
        from .pallas_msda import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, temporal_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown backend {backend!r}")


def default_backend() -> str:
    """Pick the fastest backend for the current default platform."""
    platform = jax.default_backend()
    return "matmul" if platform in ("tpu", "axon") else "gather"


def ms_deform_attn(
    value,
    temporal_shapes,
    sampling_locations,
    attention_weights,
    backend: str | None = None,
):
    """Convenience wrapper choosing a platform-appropriate backend."""
    return ms_deform_attn_core(
        value,
        tuple(int(t) for t in temporal_shapes),
        sampling_locations,
        attention_weights,
        backend=backend or default_backend(),
    )
