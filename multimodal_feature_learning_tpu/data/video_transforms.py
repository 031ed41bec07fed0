"""Raw-frame preprocessing as fused, jittable jnp transforms.

Behavioral spec: the reference raw-video path
(``dataset/anet_with_raw_video.py``): torchvision transforms — bilinear resize
(short side 256), center crop 224, [0,1] scaling + ImageNet normalization, and
random horizontal flip in training.  The reference runs these per-sample on
CPU dataloader workers; here they are pure jnp so the whole pixel frontend
compiles into the model's XLA program (BASELINE "fused XLA-compiled
preprocessing").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_bilinear(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """frames (..., H, W, C) -> (..., out_h, out_w, C), align_corners=False
    (torchvision antialias-off semantics)."""
    shape = frames.shape[:-3] + (out_h, out_w, frames.shape[-1])
    return jax.image.resize(frames, shape, method="bilinear")


def resize_short_side(frames: jnp.ndarray, size: int = 256) -> jnp.ndarray:
    """Resize so the short spatial side equals ``size`` (static shapes)."""
    H, W = frames.shape[-3], frames.shape[-2]
    if H <= W:
        out_h, out_w = size, int(round(W * size / H))
    else:
        out_h, out_w = int(round(H * size / W)), size
    return resize_bilinear(frames, out_h, out_w)


def center_crop(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    H, W = frames.shape[-3], frames.shape[-2]
    top = (H - size) // 2
    left = (W - size) // 2
    return frames[..., top : top + size, left : left + size, :]


def normalize(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] -> ImageNet-normalized float32."""
    x = frames.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def random_hflip(frames: jnp.ndarray, rng: jax.Array, p: float = 0.5) -> jnp.ndarray:
    """Per-clip horizontal flip (training augmentation)."""
    flip = jax.random.bernoulli(rng, p)
    return jax.lax.cond(flip, lambda f: f[..., ::-1, :], lambda f: f, frames)


def preprocess_clip(
    frames: jnp.ndarray,          # (T, H, W, C) uint8
    train: bool = False,
    rng: jax.Array | None = None,
    resize_size: int = 256,
    crop_size: int = 224,
) -> jnp.ndarray:
    """Full frame pipeline: resize short side -> center crop -> normalize
    (-> random flip when training). Jittable end to end."""
    x = resize_short_side(frames, resize_size)
    x = center_crop(x, crop_size)
    x = normalize(x)
    if train:
        assert rng is not None
        x = random_hflip(x, rng)
    return x


def temporal_resample_nearest(frames: jnp.ndarray, num_out: int) -> jnp.ndarray:
    """Nearest temporal resample to a fixed frame count (the raw path's
    scipy interp1d(kind='nearest') analog, static-shape)."""
    T = frames.shape[0]
    idx = jnp.clip(
        jnp.round(jnp.arange(num_out) * (T - 1) / max(num_out - 1, 1)), 0, T - 1
    ).astype(jnp.int32)
    return frames[idx]
