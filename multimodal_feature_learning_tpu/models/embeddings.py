"""Positional and vocabulary embeddings.

Behavioral spec: reference ``models/modules/embedding_layers.py`` —
``PositionEmbeddingVideoSine`` (:185-227, sine over the valid-token cumsum plus
a learned duration embedding), ``PositionalEncoding`` (:167-181, classic
sin/cos table for captions) and ``VocabularyEmbedder`` (:231-261, sqrt(d) scale,
optional GloVe projection).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def caption_positional_encoding(d_model: int, maxlen: int = 5000) -> jnp.ndarray:
    """(1, maxlen, d_model) sin/cos table; reference embedding_layers.py:167-181."""
    den = np.exp(-np.arange(0, d_model, 2) * math.log(10000) / d_model)
    pos = np.arange(0, maxlen)[:, None]
    table = np.zeros((maxlen, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * den)
    table[:, 1::2] = np.cos(pos * den)
    return jnp.asarray(table[None])


class PositionEmbeddingVideoSine(nn.Module):
    """Sine embedding over valid-token positions + learned duration embedding.

    Input: pad_mask (B, T) True=pad; duration (B,) seconds.
    Output: (B, d_model, T), first half sine/cos over positions, second half a
    Linear of the binary "duration vector" broadcast over time.
    """

    num_pos_feats: int  # = d_model // 2
    temperature: float = 10000.0
    normalize: bool = True

    @nn.compact
    def __call__(self, pad_mask: jnp.ndarray, duration: jnp.ndarray) -> jnp.ndarray:
        not_mask = (~pad_mask).astype(jnp.float32)  # (B, T)
        x_embed = jnp.cumsum(not_mask, axis=1)
        if self.normalize:
            eps = 1e-6
            scale = 2 * math.pi
            x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * jnp.floor(dim_t / 2) / self.num_pos_feats)
        pos_x = x_embed[:, :, None] / dim_t  # (B, T, F)
        pos_x = jnp.stack(
            [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
        ).reshape(pos_x.shape[0], pos_x.shape[1], -1)

        # duration embedding: binary vector (1s for the first int(duration)
        # slots, saturating at num_pos_feats), through a Linear. Reference
        # embedding_layers.py:221-227.
        slots = jnp.arange(self.num_pos_feats, dtype=jnp.int32)[None]
        dur_vec = (slots < duration.astype(jnp.int32)[:, None]).astype(jnp.float32)
        dur_embed = nn.Dense(self.num_pos_feats, name="duration_embed_layer")(dur_vec)
        dur_embed = jnp.broadcast_to(dur_embed[:, None, :], pos_x.shape)

        pos = jnp.concatenate([pos_x, dur_embed], axis=2)  # (B, T, 2F)
        return pos.transpose(0, 2, 1)  # (B, d_model, T)


def caption_sine_embedding(pad_mask: jnp.ndarray, num_pos_feats: int,
                           temperature: float = 10000.0,
                           normalize: bool = True) -> jnp.ndarray:
    """Sine embedding over valid caption positions; reference
    PositionEmbeddingCaptionSine (embedding_layers.py:267-298).
    pad_mask (B, T) True=pad -> (B, num_pos_feats, T)."""
    not_mask = (~pad_mask).astype(jnp.float32)
    x_embed = jnp.cumsum(not_mask, axis=1)
    if normalize:
        eps = 1e-6
        x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * (2 * math.pi)
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(pos_x.shape[0], pos_x.shape[1], -1)
    return pos_x.transpose(0, 2, 1)


class LearnedPositionalEmbedding(nn.Module):
    """Learned positional table added to the input (reference
    embedding_layers.py:126-165) with dropout."""

    max_tokens: int
    d_model: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        table = self.param(
            "positional_embedding", nn.initializers.truncated_normal(0.02),
            (1, self.max_tokens, self.d_model),
        )
        x = x + table[:, : x.shape[1]]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class VocabularyEmbedder(nn.Module):
    """Token embedding scaled by sqrt(d_model); optional pretrained GloVe init.

    When ``pretrained_dim`` differs from d_model, uses
    Embedding(pretrained) -> Dense(d_model) -> ReLU (reference :255-259).
    """

    vocab_size: int
    d_model: int
    pretrained_matrix: np.ndarray | None = None  # (vocab, pretrained_dim)

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        if self.pretrained_matrix is not None:
            pre_dim = self.pretrained_matrix.shape[1]
            init = lambda *_: jnp.asarray(self.pretrained_matrix, dtype=jnp.float32)
            emb = nn.Embed(self.vocab_size, pre_dim, embedding_init=init)(tokens)
            if pre_dim != self.d_model:
                emb = nn.relu(nn.Dense(self.d_model)(emb))
        else:
            emb = nn.Embed(self.vocab_size, self.d_model)(tokens)
        return emb * jnp.sqrt(jnp.float32(self.d_model)).astype(emb.dtype)
