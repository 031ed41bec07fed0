"""Raw-input backbones: ViViT (4 factorization modes) and AST.

Behavioral spec: reference ``models/regular/vivit.py:21-264`` +
``models/modules/encoders.py:33-222`` (spatio-temporal / factorised-encoder /
factorised-self-attention / factorised-dot-product-attention variants, tubelet
Conv3d token embedding, learned positional embeddings, cls tokens) and
``models/regular/ast.py:19-172`` (audio spectrogram transformer over log-mel
patches).  The reference's 'regular' path is unexercised and broken in places
(encoders.py:238,252-254; 74-75) — this is the repaired, intended design.

Pretrained-weight surgery (timm ViT/DeiT -> ViViT/AST: central-frame /
filter-inflation tubelet init, positional-embedding interpolation —
models/load_weights.py) is provided as pure pytree transforms in
``load_weights.py``; no network access is assumed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import CrossAttention, MLP


class EncoderBlock(nn.Module):
    """Standard transformer block (self-attn + MLP), pre/post-norm.
    Reference modules/layers.py:33-133 (EncoderLayer)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0
    pre_norm: bool = True

    def setup(self):
        self.attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.drop = nn.Dropout(self.projection_dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-6)
        self.norm2 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = MLP(
            int(self.d_model * self.mlp_ratio), self.d_model,
            self.mlp_dropout_1, self.mlp_dropout_2,
        )

    def __call__(self, x, deterministic: bool = True):
        if self.pre_norm:
            h = self.attention(*(self.norm1(x),) * 3, deterministic=deterministic)
            x = x + self.drop(h, deterministic=deterministic)
            x = x + self.mlp(self.norm2(x), deterministic=deterministic)
        else:
            h = self.attention(x, x, x, deterministic=deterministic)
            x = self.norm1(x + self.drop(h, deterministic=deterministic))
            x = self.norm2(x + self.mlp(x, deterministic=deterministic))
        return x


class FactorisedSelfAttentionBlock(nn.Module):
    """Spatial self-attn then temporal self-attn then MLP
    (ViViT model 3); input (B, T, P, D)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0

    def setup(self):
        self.spatial_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.temporal_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.norm1 = nn.LayerNorm(epsilon=1e-6)
        self.norm2 = nn.LayerNorm(epsilon=1e-6)
        self.norm3 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = MLP(int(self.d_model * self.mlp_ratio), self.d_model)

    def __call__(self, x, deterministic: bool = True):
        B, T, P, D = x.shape
        xs = self.norm1(x).reshape(B * T, P, D)
        x = x + self.spatial_attention(xs, xs, xs, deterministic=deterministic).reshape(B, T, P, D)
        xt = self.norm2(x).transpose(0, 2, 1, 3).reshape(B * P, T, D)
        ht = self.temporal_attention(xt, xt, xt, deterministic=deterministic)
        x = x + ht.reshape(B, P, T, D).transpose(0, 2, 1, 3)
        x = x + self.mlp(self.norm3(x), deterministic=deterministic)
        return x


class FactorisedDotProductAttentionBlock(nn.Module):
    """Half the heads attend spatially, half temporally (ViViT model 4)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, P, D = x.shape
        H = self.num_heads
        Dh = D // H
        h_s = H // 2

        y = nn.LayerNorm(epsilon=1e-6)(x)
        q = nn.Dense(D, use_bias=self.qkv_bias, name="q")(y)
        k = nn.Dense(D, use_bias=self.qkv_bias, name="k")(y)
        v = nn.Dense(D, use_bias=self.qkv_bias, name="v")(y)

        def heads(z):  # (B, T, P, D) -> (B, H, T, P, Dh)
            return z.reshape(B, T, P, H, Dh).transpose(0, 3, 1, 2, 4)

        qh, kh, vh = heads(q), heads(k), heads(v)
        scale = Dh**-0.5
        # spatial heads: attend over P within each frame
        qs, ks, vs = (z[:, :h_s] for z in (qh, kh, vh))
        att_s = nn.softmax(jnp.einsum("bhtpd,bhtqd->bhtpq", qs * scale, ks), axis=-1)
        out_s = jnp.einsum("bhtpq,bhtqd->bhtpd", att_s, vs)
        # temporal heads: attend over T at each patch position
        qt, kt, vt = (z[:, h_s:] for z in (qh, kh, vh))
        att_t = nn.softmax(jnp.einsum("bhtpd,bhspd->bhpts", qt * scale, kt), axis=-1)
        out_t = jnp.einsum("bhpts,bhspd->bhtpd", att_t, vt)

        out = jnp.concatenate([out_s, out_t], axis=1)  # (B, H, T, P, Dh)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, T, P, D)
        x = x + nn.Dense(D, name="proj")(out)
        x = x + MLP(int(D * self.mlp_ratio), D)(
            nn.LayerNorm(epsilon=1e-6)(x), deterministic=deterministic
        )
        return x


class BiModalEncoderLayer(nn.Module):
    """Video<->audio cross-attention block (regular multimodal family).
    Reference modules/layers.py:269-385 (whose live code also breaks on the
    CrossAttention tuple return — another unexercised path, repaired here)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0
    pre_norm: bool = True

    def setup(self):
        self.attention_av = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.attention_va = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.norm_av_1 = nn.LayerNorm(epsilon=1e-6)
        self.norm_va_1 = nn.LayerNorm(epsilon=1e-6)
        self.norm_av_2 = nn.LayerNorm(epsilon=1e-6)
        self.norm_va_2 = nn.LayerNorm(epsilon=1e-6)
        hidden = int(self.d_model * self.mlp_ratio)
        self.mlp_av = MLP(hidden, self.d_model, self.mlp_dropout_1, self.mlp_dropout_2)
        self.mlp_va = MLP(hidden, self.d_model, self.mlp_dropout_1, self.mlp_dropout_2)

    def __call__(self, vid, aud, deterministic: bool = True):
        if self.pre_norm:
            v_n, a_n = self.norm_av_1(vid), self.norm_va_1(aud)
            vid = vid + self.attention_av(v_n, a_n, a_n, deterministic=deterministic)
            aud = aud + self.attention_va(a_n, v_n, v_n, deterministic=deterministic)
            vid = vid + self.mlp_av(self.norm_av_2(vid), deterministic=deterministic)
            aud = aud + self.mlp_va(self.norm_va_2(aud), deterministic=deterministic)
        else:
            vid = self.norm_av_1(vid + self.attention_av(vid, aud, aud, deterministic=deterministic))
            aud = self.norm_va_1(aud + self.attention_va(aud, vid, vid, deterministic=deterministic))
            vid = self.norm_av_2(vid + self.mlp_av(vid, deterministic=deterministic))
            aud = self.norm_va_2(aud + self.mlp_va(aud, deterministic=deterministic))
        return vid, aud


class BiModalEncoder(nn.Module):
    """Stack of BiModalEncoderLayers; reference models/regular/bimodal_encoder.py."""

    d_model: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pre_norm: bool = True

    @nn.compact
    def __call__(self, vid, aud, deterministic: bool = True):
        for i in range(self.depth):
            vid, aud = BiModalEncoderLayer(
                self.d_model, self.num_heads, self.mlp_ratio, self.qkv_bias,
                pre_norm=self.pre_norm, name=f"layer_{i}",
            )(vid, aud, deterministic)
        return vid, aud


class TokenEmbedding(nn.Module):
    """Tubelet Conv3d embedding (reference embedding_layers.py:31-75):
    (B, T, H, W, C) -> (B, T', P, D) with T' = T/pt, P = (H/ps)*(W/ps)."""

    d_model: int
    spatial_patch_size: int = 16
    temporal_patch_size: int = 1

    @nn.compact
    def __call__(self, x):
        pt, ps = self.temporal_patch_size, self.spatial_patch_size
        y = nn.Conv(
            self.d_model, (pt, ps, ps), strides=(pt, ps, ps), name="project_to_patch"
        )(x)
        B, T, Hp, Wp, D = y.shape
        return y.reshape(B, T, Hp * Wp, D)


class PatchEmbedding(nn.Module):
    """Conv2d patch embedding for spectrograms (embedding_layers.py:78-122)."""

    d_model: int
    patch_size: int = 16
    strides: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, P, D)
        s = self.strides or (self.patch_size, self.patch_size)
        y = nn.Conv(
            self.d_model, (self.patch_size, self.patch_size), strides=s,
            name="project_to_patch",
        )(x)
        B, Hp, Wp, D = y.shape
        return y.reshape(B, Hp * Wp, D)


class VivitEncoder(nn.Module):
    """4-mode ViViT encoder over (B, T, P, D) token grids."""

    model_name: str
    d_model: int
    depth: int
    temporal_depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    pre_norm: bool = True

    def setup(self):
        mk = lambda: EncoderBlock(
            self.d_model, self.num_heads, self.mlp_ratio, self.qkv_bias,
            self.attention_dropout, self.projection_dropout, pre_norm=self.pre_norm,
        )
        if self.model_name == "spatio temporal attention":
            self.cls = self.param("cls", nn.initializers.zeros, (1, 1, self.d_model))
            self.encoder = [mk() for _ in range(self.depth)]
        elif self.model_name == "factorised encoder":
            self.spatial_token = self.param(
                "spatial_token", nn.initializers.zeros, (1, 1, self.d_model)
            )
            self.temporal_token = self.param(
                "temporal_token", nn.initializers.zeros, (1, 1, self.d_model)
            )
            self.spatial_encoder = [mk() for _ in range(self.depth)]
            self.temporal_encoder = [mk() for _ in range(self.temporal_depth)]
        elif self.model_name == "factorised self attention":
            self.encoder = [
                FactorisedSelfAttentionBlock(
                    self.d_model, self.num_heads, self.mlp_ratio, self.qkv_bias,
                    self.attention_dropout, self.projection_dropout,
                )
                for _ in range(self.depth)
            ]
        elif self.model_name == "factorised dot product attention":
            self.encoder = [
                FactorisedDotProductAttentionBlock(
                    self.d_model, self.num_heads, self.mlp_ratio, self.qkv_bias,
                    self.attention_dropout, self.projection_dropout,
                )
                for _ in range(self.depth)
            ]
        else:
            raise ValueError(f"unknown vivit mode {self.model_name!r}")

    def __call__(self, x, pos_embedding=None, spatial_pos_embedding=None,
                 deterministic: bool = True):
        B, T, P, D = x.shape
        add = lambda z, e: z if e is None else z + e[:, : z.shape[1]]
        if self.model_name == "spatio temporal attention":
            x = x.reshape(B, T * P, D)
            x = jnp.concatenate([jnp.broadcast_to(self.cls, (B, 1, D)), x], axis=1)
            for layer in self.encoder:
                x = layer(add(x, pos_embedding), deterministic)
            return x  # (B, T*P+1, D)
        if self.model_name == "factorised encoder":
            x = x.reshape(B * T, P, D)
            x = jnp.concatenate(
                [jnp.broadcast_to(self.spatial_token, (B * T, 1, D)), x], axis=1
            )
            for layer in self.spatial_encoder:
                x = layer(add(x, spatial_pos_embedding), deterministic)
            x = x.reshape(B, T, P + 1, D)[:, :, 0]  # spatial cls per frame
            x = jnp.concatenate(
                [jnp.broadcast_to(self.temporal_token, (B, 1, D)), x], axis=1
            )
            for layer in self.temporal_encoder:
                x = layer(add(x, pos_embedding), deterministic)
            return x  # (B, T+1, D)
        # factorised self attention / dot product: keep the (B, T, P, D) grid
        for layer in self.encoder:
            x = layer(x, deterministic)
        return x


class VideoVisionTransformer(nn.Module):
    """ViViT backbone producing per-frame features for the DVC head
    (return_preclassifier semantics of reference vivit.py)."""

    model_name: str = "factorised encoder"
    d_model: int = 768
    depth: int = 12
    temporal_depth: int = 4
    num_heads: int = 12
    spatial_patch_size: int = 16
    temporal_patch_size: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    pre_norm: bool = True
    max_tokens: int = 4096

    def setup(self):
        self.token_embeddings_layer = TokenEmbedding(
            self.d_model, self.spatial_patch_size, self.temporal_patch_size
        )
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.truncated_normal(0.02),
            (1, self.max_tokens, self.d_model),
        )
        self.spatial_pos_embedding = self.param(
            "spatial_pos_embedding", nn.initializers.truncated_normal(0.02),
            (1, self.max_tokens, self.d_model),
        )
        self.encoder = VivitEncoder(
            self.model_name, self.d_model, self.depth, self.temporal_depth,
            self.num_heads, self.mlp_ratio, self.qkv_bias,
            self.attention_dropout, self.projection_dropout, self.pre_norm,
        )

    def __call__(self, frames, deterministic: bool = True):
        """frames: (B, T, H, W, C) normalized. Returns per-frame features:
        (B, T', D) for 'factorised encoder' (cls dropped), else token grid."""
        x = self.token_embeddings_layer(frames)
        out = self.encoder(
            x, self.pos_embedding, self.spatial_pos_embedding, deterministic
        )
        if self.model_name == "factorised encoder":
            return out[:, 1:]  # (B, T', D) per-frame embeddings
        if self.model_name == "spatio temporal attention":
            return out[:, 1:]  # (B, T'*P, D)
        return out.mean(axis=2)  # (B, T', D) pool patches


class AudioSpectrogramTransformer(nn.Module):
    """AST over log-mel spectrograms (reference models/regular/ast.py)."""

    d_model: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    frequency_stride: int = 10
    time_stride: int = 10
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    max_tokens: int = 4096

    def setup(self):
        self.patch_embedding = PatchEmbedding(
            self.d_model, self.patch_size,
            strides=(self.frequency_stride, self.time_stride),
        )
        self.cls = self.param("cls", nn.initializers.zeros, (1, 1, self.d_model))
        self.distill_token = self.param(
            "distill_token", nn.initializers.zeros, (1, 1, self.d_model)
        )  # DeiT-style, kept for weight-surgery compatibility
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.truncated_normal(0.02),
            (1, self.max_tokens, self.d_model),
        )
        self.encoder = [
            EncoderBlock(
                self.d_model, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.attention_dropout, self.projection_dropout, pre_norm=True,
            )
            for _ in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6)

    def __call__(self, spectrogram, deterministic: bool = True):
        """spectrogram: (B, n_frames, n_mels) -> (B, P+2, D) token features."""
        x = self.patch_embedding(spectrogram[..., None])
        B, P, D = x.shape
        x = jnp.concatenate(
            [
                jnp.broadcast_to(self.cls, (B, 1, D)),
                jnp.broadcast_to(self.distill_token, (B, 1, D)),
                x,
            ],
            axis=1,
        )
        x = x + self.pos_embedding[:, : x.shape[1]]
        for layer in self.encoder:
            x = layer(x, deterministic)
        return self.norm(x)
