"""MSDeformAttn as a flax module (projections + sampling-location computation).

Behavioral spec: reference ``models/modules/attention.py:394-511`` — linear
sampling_offsets / attention_weights (softmax over levels x points), value
projection with padding zero-fill, reference-point + shape-normalized offsets,
and the directional-bias initialization of the offset head (:426-442).
The sampling core runs through ``ops.ms_deform_attn_core`` (backend-selectable:
jnp gather oracle / MXU matmul / fused Pallas kernel).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import ms_deform_attn_core, default_backend


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional bias: head h points along cos(2*pi*h/H) normalized to +-1,
    scaled by (point index + 1). 1-D slice of the reference grid init
    (attention.py:427-435)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)  # (H, 2) in [-1, 1]
    grid = grid[:, None, None, 0].repeat(n_levels, 1).repeat(n_points, 2)  # (H, L, P)
    for i in range(n_points):
        grid[:, :, i] *= i + 1
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    d_model: int
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    backend: str = ""  # '' = platform default

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # (B, Q, D) (with pos embed added)
        reference_points: jnp.ndarray,  # (B, Q, L, 1) or (B, Q, L, 2) in [0,1]
        value_input: jnp.ndarray,       # (B, S, D) flattened levels
        temporal_shapes: tuple,         # static (L,)
        padding_mask=None,              # (B, S) True=pad
    ):
        """Returns (output (B, Q, D), sampling_locations (B,Q,H,L,P),
        attention_weights (B,Q,H,L,P))."""
        B, Q, _ = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        Dh = self.d_model // H

        value = nn.Dense(self.d_model, name="value_proj")(value_input)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, H, Dh)

        offsets = nn.Dense(
            H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(_offset_bias_init(H, L, P)),
            name="sampling_offsets",
        )(query).reshape(B, Q, H, L, P)

        attn = nn.Dense(
            H * L * P,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        # softmax in f32 even under a bf16 trunk (tiny tensor; the weights are
        # folded into the splat matrix / gather accumulation in f32 and only
        # cast down at the matmul input)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(B, Q, H, L, P)

        shapes_arr = jnp.asarray(temporal_shapes, dtype=jnp.float32)
        ref_c = reference_points[:, :, None, :, 0:1]  # (B, Q, 1, L, 1)
        if reference_points.shape[-1] == 1:
            # offsets normalized by per-level token count (attention.py:473-476)
            loc = ref_c + offsets / shapes_arr[None, None, None, :, None]
        elif reference_points.shape[-1] == 2:
            ref_l = reference_points[:, :, None, :, 1:2]  # (B, Q, 1, L, 1)
            loc = ref_c + offsets / P * ref_l * 0.5
        else:
            raise ValueError("reference_points last dim must be 1 or 2")

        backend = self.backend or default_backend()
        out = ms_deform_attn_core(value, tuple(temporal_shapes), loc, attn, backend)
        # backends may accumulate in f32; return to the value compute dtype so
        # the output projection matmul stays on the bf16 MXU path
        out = nn.Dense(self.d_model, name="output_proj")(out.astype(value.dtype))
        return out, loc, attn
