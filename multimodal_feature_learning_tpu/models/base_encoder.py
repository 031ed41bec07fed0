"""Multi-scale temporal feature pyramid.

Behavioral spec: reference ``models/base_encoder.py:13-92`` — level 0 is a
pointwise Conv1d + GroupNorm(32) of the input features; levels 1..L-1 are
strided (k=3, s=2, p=1) Conv1d + GroupNorm chains (level 1 consumes the raw
input, deeper levels consume the previous level).  Masks are downsampled with
nearest interpolation; each level gets the sine+duration position embedding.

Layout note: the reference works channels-first (B, C, T); here everything is
channels-last (B, T, C) — the natural layout for TPU convs/matmuls — and the
outputs are the flattened per-level sources ready for the transformer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import PositionEmbeddingVideoSine


def interpolate_mask_nearest(mask: jnp.ndarray, new_size: int) -> jnp.ndarray:
    """Nearest-neighbor mask downsampling, matching
    ``F.interpolate(mask.float(), size=new_size)`` (reference base_encoder.py:82):
    out[i] = in[floor(i * T_in / T_out)]."""
    T_in = mask.shape[1]
    idx = (jnp.arange(new_size) * T_in) // new_size
    return mask[:, idx]


class BaseEncoder(nn.Module):
    num_feature_levels: int
    d_model: int

    @nn.compact
    def __call__(self, vf: jnp.ndarray, mask: jnp.ndarray, duration: jnp.ndarray):
        """
        Args:
          vf: (B, T, feature_dim) rescaled video features.
          mask: (B, T) bool, True = padding.
          duration: (B,) seconds.

        Returns:
          srcs:  list of (B, T_l, d_model)
          masks: list of (B, T_l) bool True=pad
          pos:   list of (B, T_l, d_model) sine+duration embeddings
        """
        pos_embed = PositionEmbeddingVideoSine(
            self.d_model // 2, normalize=True, name="pos_embed"
        )
        # epsilon matches torch GroupNorm default (reference base_encoder.py:31)
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)

        srcs, masks, poses = [], [], []

        src0 = nn.Conv(self.d_model, (1,), name="input_proj_0")(vf)
        src0 = gn("gn_0")(src0)
        srcs.append(src0)
        masks.append(mask)
        # sine table is built in f32 from masks/durations; cast to the trunk
        # compute dtype so adding it downstream never re-promotes bf16 to f32
        poses.append(pos_embed(mask, duration).transpose(0, 2, 1).astype(src0.dtype))

        prev = None
        for l in range(1, self.num_feature_levels):
            inp = vf if l == 1 else prev
            src = nn.Conv(
                self.d_model, (3,), strides=(2,), padding=[(1, 1)],
                name=f"input_proj_{l}",
            )(inp)
            src = gn(f"gn_{l}")(src)
            m = interpolate_mask_nearest(mask, src.shape[1])
            pos_l = pos_embed(m, duration).transpose(0, 2, 1).astype(src.dtype)
            srcs.append(src)
            masks.append(m)
            poses.append(pos_l)
            prev = src

        return srcs, masks, poses


def pyramid_shapes(video_len: int, num_levels: int) -> tuple:
    """Static per-level token counts for a given rescaled video length."""
    shapes = [video_len]
    t = video_len
    for _ in range(num_levels - 1):
        t = (t + 1) // 2  # conv k3 s2 p1: ceil(T/2)
        shapes.append(t)
    return tuple(shapes)
