"""Mixed-precision policy helpers.

Policy (the standard TPU recipe): master params and the optimizer state stay
float32; inside the forward/backward the float leaves of params and inputs are
cast to ``cfg.compute_dtype`` (bfloat16 in production) so every matmul/conv
runs on the MXU in bf16.  Attention logits, softmaxes, normalization statistics
and the loss/matcher math stay float32 — the cast sites live in the model code
(see models/dvc.py, models/layers.py, models/caption_decoder.py).

The reference has no mixed precision (full-f32 torch, config_dvc_train.py);
this is a TPU-native extension gated by ``cfg.compute_dtype``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_dtype(name: str):
    """'bfloat16' | 'float32' -> jnp dtype."""
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", ""):
        return jnp.float32
    raise ValueError(f"unsupported compute_dtype {name!r}")


def cast_floating(tree, dtype):
    """Cast every floating-point array leaf of a pytree to ``dtype``;
    ints/bools and non-arrays pass through untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
