"""Multimodal (video + audio) DVC family.

Behavioral spec: the *intended* multimodal models of the reference — all four
multimodal classes are broken at construction in the snapshot (SURVEY §0):
  * cross-modal sparse encoder: per layer, deformable self-attn within each
    modality then deformable cross-modal attention (audio queries sampling the
    video memory and vice versa), sparse top-rho token selection per modality
    with per-sample scatter-back
    (models/sparse/multimodal_sparse_deformable_transformer.py:298-583 —
    fixing its audio-scatter-reads-video and shared-attention artifacts).
  * decoder layer: query self-attn, dual deformable cross-attn into the two
    memories, concat bridge LN(2D)->Linear->dropout->ReLU, FFN
    (models/deformable/multimodal_deformable_transformer.py:330-433).
  * caption decoder layer: self-attn, dual vanilla cross-attn, concat bridge
    Linear(2D->D)+GELU, MLP (models/modules/layers.py:648-823, repaired).
  * context loss: mean of video/audio BCE (criterion.py:363-390) — handled by
    SetCriterion via the multimodal outputs keys.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment_ops import denormalize_segments, inverse_sigmoid
from .base_encoder import BaseEncoder, pyramid_shapes
from .caption_decoder import make_causal_mask
from .embeddings import VocabularyEmbedder, caption_positional_encoding
from .layers import ContextMaskModel, CrossAttention, FFN, MLP
from .matcher import hungarian_match
from .msda_module import MSDeformAttn
from .transformer import (
    SparseDeformableTransformer,
    get_encoder_reference_points,
    predict_event_num,
)
from .dvc import crop_segments


# ---------------------------------------------------------------------------
# cross-modal encoder
# ---------------------------------------------------------------------------

class CrossModalEncoderLayer(nn.Module):
    """Deformable self-attn per modality + deformable cross-modal attention."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_backend: str = ""

    def setup(self):
        self.self_attn_video = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.self_attn_audio = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.cross_attn_v2a = MSDeformAttn(  # video queries sample audio values
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.cross_attn_a2v = MSDeformAttn(  # audio queries sample video values
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.dropout1 = nn.Dropout(self.dropout)
        self.norm_v = nn.LayerNorm(epsilon=1e-5)
        self.norm_a = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(self.d_ffn)
        self.dropout2 = nn.Dropout(self.dropout)
        self.linear2 = nn.Dense(self.d_model)
        self.dropout3 = nn.Dropout(self.dropout)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)

    def _ffn(self, x, deterministic):
        h = self.linear2(self.dropout2(nn.relu(self.linear1(x)), deterministic=deterministic))
        return self.norm2(x + self.dropout3(h, deterministic=deterministic))

    def __call__(
        self,
        video_src, audio_src,          # dense memories (B, Sv/Sa, D)
        video_q, audio_q,              # queries (sparse tokens or dense) or None
        video_pos, audio_pos,          # pos embeds of the queries
        video_ref, audio_ref,          # reference points of the queries
        video_shapes, audio_shapes,    # static temporal shapes
        video_mask, audio_mask,        # (B, S) padding masks of the memories
        deterministic: bool = True,
    ):
        """Returns (audio_attended_visual, visual_attended_audio,
        v_loc, v_attn, a_loc, a_attn) for the query token sets."""
        vq = video_src if video_q is None else video_q
        aq = audio_src if audio_q is None else audio_q

        v2, _, _ = self.self_attn_video(
            vq + video_pos, video_ref, video_src, video_shapes, video_mask
        )
        vq = self.norm_v(vq + self.dropout1(v2, deterministic=deterministic))

        a2, _, _ = self.self_attn_audio(
            aq + audio_pos, audio_ref, audio_src, audio_shapes, audio_mask
        )
        aq = self.norm_a(aq + self.dropout1(a2, deterministic=deterministic))

        # cross-modal: each modality's queries sample the OTHER memory
        audio_attended_visual, v_loc, v_attn = self.cross_attn_v2a(
            vq, video_ref, audio_src, audio_shapes, audio_mask
        )
        visual_attended_audio, a_loc, a_attn = self.cross_attn_a2v(
            aq, audio_ref, video_src, video_shapes, video_mask
        )

        audio_attended_visual = self._ffn(audio_attended_visual, deterministic)
        visual_attended_audio = self._ffn(visual_attended_audio, deterministic)
        return audio_attended_visual, visual_attended_audio, v_loc, v_attn, a_loc, a_attn


class MultimodalDecoderLayer(nn.Module):
    """Query self-attn + dual deformable cross-attn + concat bridge + FFN."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_backend: str = ""

    def setup(self):
        self.self_attn = CrossAttention(
            self.d_model, self.n_heads, qkv_bias=True, attention_dropout=self.dropout
        )
        self.dropout2 = nn.Dropout(self.dropout)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.cross_attn_video = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.cross_attn_audio = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, self.msda_backend
        )
        self.dropout1 = nn.Dropout(self.dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        # bridge (multimodal_deformable_transformer.py:364-367, 424-430)
        self.norm4 = nn.LayerNorm(epsilon=1e-5)
        self.linear3 = nn.Dense(self.d_model)
        self.dropout5 = nn.Dropout(self.dropout)
        # ffn
        self.linear1 = nn.Dense(self.d_ffn)
        self.dropout3 = nn.Dropout(self.dropout)
        self.linear2 = nn.Dense(self.d_model)
        self.dropout4 = nn.Dropout(self.dropout)
        self.norm3 = nn.LayerNorm(epsilon=1e-5)

    def __call__(
        self,
        tgt, query_pos,
        video_ref, audio_ref,          # (B, Q, L, 1) per modality
        video_src, audio_src,
        video_shapes, audio_shapes,
        video_mask, audio_mask,
        deterministic: bool = True,
    ):
        q = tgt + query_pos
        sa = self.self_attn(q, q, tgt, deterministic=deterministic)
        tgt = self.norm2(tgt + self.dropout2(sa, deterministic=deterministic))

        q2 = tgt + query_pos
        tv, v_loc, v_attn = self.cross_attn_video(
            q2, video_ref, video_src, video_shapes, video_mask
        )
        tv = self.norm1(tgt + self.dropout1(tv, deterministic=deterministic))
        ta, a_loc, a_attn = self.cross_attn_audio(
            q2, audio_ref, audio_src, audio_shapes, audio_mask
        )
        ta = self.norm1(tgt + self.dropout1(ta, deterministic=deterministic))

        x = jnp.concatenate([tv, ta], axis=-1)
        x = self.norm4(x)
        x = self.linear3(x)
        x = self.dropout5(x, deterministic=deterministic)
        x = nn.relu(x)

        h = self.linear2(self.dropout3(nn.relu(self.linear1(x)), deterministic=deterministic))
        x = self.norm3(x + self.dropout4(h, deterministic=deterministic))
        return x, v_loc, v_attn, a_loc, a_attn


# ---------------------------------------------------------------------------
# multimodal proposal net
# ---------------------------------------------------------------------------

class MultimodalProposalNet(nn.Module):
    """Two base-encoder pyramids -> cross-modal (sparse) encoder -> multimodal
    decoder -> segment/count heads."""

    d_model: int = 512
    num_queries: int = 20
    num_feature_levels: int = 4
    num_heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ff_dim: int = 2048
    dropout: float = 0.1
    enc_n_points: int = 4
    dec_n_points: int = 4
    rho: float = 0.5
    max_eseq_length: int = 10
    video_rescale_len: int = 300
    audio_rescale_len: int = 50
    msda_backend: str = ""

    def setup(self):
        self.video_base_encoder = BaseEncoder(self.num_feature_levels, self.d_model)
        self.audio_base_encoder = BaseEncoder(self.num_feature_levels, self.d_model)
        # reuse the unimodal transformer's preparation machinery per modality
        kw = dict(
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_encoder_layers=0,
            num_decoder_layers=0,
            dim_feedforward=self.ff_dim,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            rho=self.rho,
            use_enc_aux_loss=False,
            msda_backend=self.msda_backend,
        )
        self.video_prep = SparseDeformableTransformer(**kw)
        self.audio_prep = SparseDeformableTransformer(**kw)
        self.enc_layers_mod = [
            CrossModalEncoderLayer(
                self.d_model, self.ff_dim, self.dropout,
                self.num_feature_levels, self.num_heads, self.enc_n_points,
                self.msda_backend,
            )
            for _ in range(self.enc_layers)
        ]
        self.dec_layers_mod = [
            MultimodalDecoderLayer(
                self.d_model, self.ff_dim, self.dropout,
                self.num_feature_levels, self.num_heads, self.dec_n_points,
                self.msda_backend,
            )
            for _ in range(self.dec_layers)
        ]
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model * 2),
        )
        self.reference_points_head = nn.Dense(1)
        self.segment_embedding_decoder = FFN(self.d_model, 2, 3, final_zero_init=True)
        self.count_head_decoder = nn.Dense(self.max_eseq_length + 1)

    def _encode_modality(self, prep, tgt_none, enc_inputs):
        """Gather sparse queries for one modality. Returns dict of query-side
        tensors + scatter bookkeeping."""
        src = enc_inputs["src_flatten"]
        shapes = enc_inputs["temporal_shapes"]
        refs = get_encoder_reference_points(shapes, enc_inputs["valid_ratios"])
        topk = enc_inputs["backbone_topk_proposals"]
        if topk is None:
            return {
                "q": None, "pos": enc_inputs["lvl_pos_flatten"], "ref": refs,
                "rows": None, "topk": None, "keep": None,
            }
        B, K = topk.shape
        rows = jnp.arange(B)[:, None]
        keep = jnp.arange(K)[None, :] < enc_inputs["sparse_token_nums"][:, None]
        return {
            "q": src[rows, topk],
            "pos": enc_inputs["lvl_pos_flatten"][rows, topk],
            "ref": refs[rows, topk],
            "rows": rows, "topk": topk, "keep": keep,
        }

    @staticmethod
    def _scatter_back(output, q_new, sel):
        if sel["topk"] is None:
            return q_new, q_new
        old = jnp.take_along_axis(output, sel["topk"][..., None], axis=1)
        vals = jnp.where(sel["keep"][..., None], q_new, old)
        return output.at[sel["rows"], sel["topk"]].set(vals), q_new

    def __call__(
        self,
        video, video_mask, audio, audio_mask, durations,
        deterministic: bool = True,
    ):
        B = video.shape[0]
        v_srcs, v_masks, v_poses = self.video_base_encoder(video, video_mask, durations)
        a_srcs, a_masks, a_poses = self.audio_base_encoder(audio, audio_mask, durations)

        v_in = self.video_prep.prepare_encoder_inputs(v_srcs, v_masks, v_poses)
        a_in = self.audio_prep.prepare_encoder_inputs(a_srcs, a_masks, a_poses)
        v_shapes, a_shapes = v_in["temporal_shapes"], a_in["temporal_shapes"]

        v_sel = self._encode_modality(self.video_prep, None, v_in)
        a_sel = self._encode_modality(self.audio_prep, None, a_in)

        video_out, audio_out = v_in["src_flatten"], a_in["src_flatten"]
        vq, aq = v_sel["q"], a_sel["q"]
        for layer in self.enc_layers_mod:
            aav, vaa, *_ = layer(
                video_out, audio_out, vq, aq,
                v_sel["pos"], a_sel["pos"], v_sel["ref"], a_sel["ref"],
                v_shapes, a_shapes, v_in["mask_flatten"], a_in["mask_flatten"],
                deterministic,
            )
            video_out, vq = self._scatter_back(video_out, aav, v_sel)
            audio_out, aq = self._scatter_back(audio_out, vaa, a_sel)

        # decoder
        query_pos, tgt = jnp.split(self.query_embedding, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)
        reference_points = nn.sigmoid(self.reference_points_head(query_pos))  # (B,Q,1)
        init_ref = reference_points

        inter, refs_list = [], []
        v_locs, v_attns, a_locs, a_attns = [], [], [], []
        output = tgt
        for layer in self.dec_layers_mod:
            v_ref = reference_points[:, :, None, :] * v_in["valid_ratios"][:, None, :, None]
            a_ref = reference_points[:, :, None, :] * a_in["valid_ratios"][:, None, :, None]
            output, v_loc, v_attn, a_loc, a_attn = layer(
                output, query_pos, v_ref, a_ref,
                video_out, audio_out, v_shapes, a_shapes,
                v_in["mask_flatten"], a_in["mask_flatten"], deterministic,
            )
            inter.append(output)
            refs_list.append(reference_points)
            v_locs.append(v_loc)
            v_attns.append(v_attn)
            a_locs.append(a_loc)
            a_attns.append(a_attn)

        query_features = jnp.stack(inter)  # (layers, B, Q, D)
        inter_references = jnp.stack(refs_list)

        outputs_segment = self.segment_embedding_decoder(query_features)
        outputs_count = predict_event_num(self.count_head_decoder, query_features)
        reference = jnp.concatenate([init_ref[None], inter_references[:-1]], axis=0)
        outputs_segment = nn.sigmoid(outputs_segment + inverse_sigmoid(reference))

        out = {
            "pred_segments": outputs_segment[-1],
            "pred_count": outputs_count[-1],
            "outputs_segment_all": outputs_segment,
            "outputs_count_all": outputs_count,
            "video_memory": video_out,
            "audio_memory": audio_out,
            "query_features": query_features,
            "video_temporal_shapes": v_shapes,
            "audio_temporal_shapes": a_shapes,
            # the mask-prediction loss keys are wired to the VIDEO stream (the
            # dominant modality), mirroring the unimodal sparse contract
            "temporal_shapes": v_shapes,
            "level_start_index": tuple(int(x) for x in np.cumsum((0,) + v_shapes[:-1])),
            "sampling_locations_dec": jnp.stack(v_locs, axis=1),
            "attn_weights_dec": jnp.stack(v_attns, axis=1),
            "audio_sampling_locations_dec": jnp.stack(a_locs, axis=1),
            "audio_attn_weights_dec": jnp.stack(a_attns, axis=1),
            "mask_flatten": v_in["mask_flatten"],
        }
        if self.rho:
            out["backbone_mask_prediction"] = v_in["backbone_mask_prediction"]
            out["backbone_topk_proposals"] = v_in["backbone_topk_proposals"]
            out["sparse_token_nums"] = v_in["sparse_token_nums"]
        return out


# ---------------------------------------------------------------------------
# multimodal caption decoder
# ---------------------------------------------------------------------------

class MultimodalCaptionDecoderLayer(nn.Module):
    """Self-attn + dual cross-attn + concat bridge + MLP (post-norm), the
    repaired reference layer (layers.py:648-823)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    bridge_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0

    def setup(self):
        self.self_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.video_cross_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.audio_cross_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.drop_1 = nn.Dropout(self.projection_dropout)
        self.drop_2 = nn.Dropout(self.projection_dropout)
        self.drop_3 = nn.Dropout(self.projection_dropout)
        self.linear_layer = nn.Dense(self.d_model)
        self.bridge_drop = nn.Dropout(self.bridge_dropout)
        self.layer_norm_1 = nn.LayerNorm(epsilon=1e-6)
        self.layer_norm_2 = nn.LayerNorm(epsilon=1e-6)
        self.layer_norm_3 = nn.LayerNorm(epsilon=1e-6)
        self.layer_norm_4 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = MLP(
            int(self.d_model * self.mlp_ratio), self.d_model,
            self.mlp_dropout_1, self.mlp_dropout_2,
        )

    def _post_self(self, x, vid_x, aud_x, deterministic):
        """Shared tail: bridge + MLP after self/cross attention."""
        x = jnp.concatenate([vid_x, aud_x], axis=-1)
        x = self.linear_layer(x)
        x = self.bridge_drop(x, deterministic=deterministic)
        x = self.layer_norm_3(x)
        x = nn.gelu(x, approximate=False)
        return self.layer_norm_4(x + self.mlp(x, deterministic=deterministic))

    def __call__(
        self, target, video_memory, audio_memory,
        tgt_mask=None, tgt_padding_mask=None,
        video_memory_padding_mask=None, audio_memory_padding_mask=None,
        deterministic: bool = True,
    ):
        x = target
        sa = self.self_attention(
            x, x, x, attn_mask=tgt_mask, key_padding_mask=tgt_padding_mask,
            deterministic=deterministic,
        )
        x = self.layer_norm_1(x + self.drop_1(sa, deterministic=deterministic))

        cav = self.video_cross_attention(
            x, video_memory, video_memory,
            key_padding_mask=video_memory_padding_mask, deterministic=deterministic,
        )
        vid_x = self.layer_norm_2(x + self.drop_2(cav, deterministic=deterministic))
        caa = self.audio_cross_attention(
            x, audio_memory, audio_memory,
            key_padding_mask=audio_memory_padding_mask, deterministic=deterministic,
        )
        aud_x = self.layer_norm_2(x + self.drop_3(caa, deterministic=deterministic))
        return self._post_self(x, vid_x, aud_x, deterministic)

    def project_memory_kv(self, video_memory, audio_memory):
        return (
            self.video_cross_attention.project_kv(video_memory, video_memory),
            self.audio_cross_attention.project_kv(audio_memory, audio_memory),
        )

    def incremental_pair(
        self, x, step, k_cache, v_cache, valid_len,
        vid_kv, aud_kv, video_memory_padding_mask, audio_memory_padding_mask,
    ):
        """Fused commit+predict for the multimodal layer (see
        UnimodalCaptionDecoderLayer.incremental_pair for the scheme)."""
        N, _, D = x.shape
        Tc = k_cache.shape[1]
        kx, vx = self.self_attention.project_kv(x[:, :1], x[:, :1])
        k_cache = jax.lax.dynamic_update_slice(k_cache, kx, (0, step, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, vx, (0, step, 0))

        key_mask = (jnp.arange(Tc) >= valid_len)[None, :]
        qx = self.self_attention.project_q(x)
        sa = self.self_attention.attend(
            qx, k_cache, v_cache,
            key_padding_mask=jnp.broadcast_to(key_mask, (N, Tc)),
        )
        x = self.layer_norm_1(x + self.drop_1(sa, deterministic=True))

        mkv, mvv = vid_kv
        mka, mva = aud_kv
        qv = self.video_cross_attention.project_q(x)
        cav = self.video_cross_attention.attend(
            qv, mkv, mvv, key_padding_mask=video_memory_padding_mask
        )
        vid_x = self.layer_norm_2(x + self.drop_2(cav, deterministic=True))
        qa = self.audio_cross_attention.project_q(x)
        caa = self.audio_cross_attention.attend(
            qa, mka, mva, key_padding_mask=audio_memory_padding_mask
        )
        aud_x = self.layer_norm_2(x + self.drop_3(caa, deterministic=True))
        return self._post_self(x, vid_x, aud_x, True), k_cache, v_cache


class MultimodalCaptionDecoder(nn.Module):
    vocab_size: int
    seq_len: int = 20
    d_model: int = 512
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    positional_embedding_dropout: float = 0.0
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    bridge_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0
    return_intermediate: bool = True
    pretrained_matrix: Optional[np.ndarray] = None

    def setup(self):
        self.target_embedding = VocabularyEmbedder(
            self.vocab_size, self.d_model, self.pretrained_matrix
        )
        self.pos_table = caption_positional_encoding(self.d_model)
        self.pos_dropout = nn.Dropout(self.positional_embedding_dropout)
        self.decoder = [
            MultimodalCaptionDecoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                attention_dropout=self.attention_dropout,
                projection_dropout=self.projection_dropout,
                bridge_dropout=self.bridge_dropout,
                mlp_dropout_1=self.mlp_dropout_1,
                mlp_dropout_2=self.mlp_dropout_2,
            )
            for _ in range(self.depth)
        ]
        self.head = nn.Dense(self.vocab_size)

    def __call__(
        self, tgt, video_memory, audio_memory,
        tgt_mask=None, tgt_padding_mask=None,
        video_memory_padding_mask=None, audio_memory_padding_mask=None,
        deterministic: bool = True,
        return_logits: bool = False,
    ):
        x = self.target_embedding(tgt)
        x = x + self.pos_table[:, : x.shape[1], :]
        x = self.pos_dropout(x, deterministic=deterministic)
        if tgt_mask is not None and tgt_mask.ndim == 2:
            tgt_mask = tgt_mask[None, None]
        intermediate = []
        for layer in self.decoder:
            x = layer(
                x, video_memory, audio_memory, tgt_mask, tgt_padding_mask,
                video_memory_padding_mask, audio_memory_padding_mask,
                deterministic,
            )
            if self.return_intermediate:
                intermediate.append(x)
        stacked = jnp.stack(intermediate) if self.return_intermediate else x[None]
        # train path (return_logits): raw compute-dtype logits for the
        # criterion's fused label_smoothing_kl_logits (upcasts internally) —
        # no stored V-sized log-prob or f32-logit tensor
        if return_logits:
            return self.head(stacked)
        return nn.log_softmax(self.head(stacked).astype(jnp.float32), axis=-1)


def _mm_precompute(mdl, video_memory, audio_memory):
    """Per-layer one-shot memory k/v projection (both modalities)."""
    return [layer.project_memory_kv(video_memory, audio_memory)
            for layer in mdl.decoder]


def _mm_embed_at(mdl, tokens, pos):
    x = mdl.target_embedding(tokens[:, None])
    pe = jax.lax.dynamic_slice_in_dim(mdl.pos_table, pos, 1, axis=1)
    return x + pe.astype(x.dtype)


def _mm_decode_pair_fn(mem_kv, video_mask, audio_mask):
    """Fused commit(prev @ step) + predict(step+1) over the layer stack,
    shared by the greedy and beam decodes (the masks/mem_kv differ: beam
    repeats them per beam)."""

    def _decode_pair(mdl, prev_tok, pad_tok, step, k_caches, v_caches):
        x_prev = _mm_embed_at(mdl, prev_tok, step)
        x_next = _mm_embed_at(mdl, pad_tok, step + 1)
        x = jnp.concatenate([x_prev, x_next], axis=1)
        new_k, new_v = [], []
        for li, layer in enumerate(mdl.decoder):
            vid_kv, aud_kv = mem_kv[li]
            x, kc, vc = layer.incremental_pair(
                x, step, k_caches[li], v_caches[li], step + 1,
                vid_kv, aud_kv, video_mask, audio_mask,
            )
            new_k.append(kc)
            new_v.append(vc)
        return mdl.head(x[:, 1, :]), jnp.stack(new_k), jnp.stack(new_v)

    return _decode_pair


def multimodal_greedy_decode(
    module, params, video_memory, video_mask, audio_memory, audio_mask,
    seq_len, bos_idx, eos_idx, pad_idx, faster_eval=False,
):
    """KV-cached greedy decode for the multimodal decoder: fused
    commit+predict per step, memory k/v projected once per modality —
    the multimodal analog of caption_decoder.greedy_decode."""
    N, _, D = video_memory.shape
    depth = module.depth

    mem_kv = module.apply(
        params, video_memory, audio_memory, method=_mm_precompute
    )
    _decode_pair = _mm_decode_pair_fn(mem_kv, video_mask, audio_mask)

    captions = jnp.full((N, seq_len), pad_idx, dtype=jnp.int32).at[:, 0].set(bos_idx)
    done = jnp.zeros((N,), dtype=bool)
    k_caches = jnp.zeros((depth, N, seq_len, D), dtype=video_memory.dtype)
    v_caches = jnp.zeros((depth, N, seq_len, D), dtype=video_memory.dtype)

    def step_fn(carry):
        t, captions, done, k_caches, v_caches = carry
        prev_tok = jnp.take_along_axis(
            captions, (t - 1)[None, None].repeat(N, 0), axis=1
        )[:, 0]
        pad_tok = jnp.full((N,), pad_idx, dtype=jnp.int32)
        logits, k_caches, v_caches = module.apply(
            params, prev_tok, pad_tok, t - 1, k_caches, v_caches,
            method=_decode_pair,
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not faster_eval:
            tok = jnp.where(done, pad_idx, tok)
        captions = captions.at[:, t].set(tok)
        done = done | (tok == eos_idx)
        return (t + 1, captions, done, k_caches, v_caches)

    def step_cond(carry):
        # early exit once every caption has emitted <eos> (mirrors
        # caption_decoder.greedy_decode; token-identical — frozen captions
        # only ever append <pad>). faster_eval fills every position.
        t, _, done, *_ = carry
        if faster_eval:
            return t < seq_len
        return (t < seq_len) & ~jnp.all(done)

    _, captions, done, _, _ = jax.lax.while_loop(
        step_cond, step_fn,
        (jnp.int32(1), captions, done, k_caches, v_caches),
    )
    if faster_eval:
        # reference appends an unconditional <eos> column (:348-351)
        last = jnp.full((N,), eos_idx, dtype=jnp.int32)
    else:
        has_eos = jnp.any(captions == eos_idx, axis=1)
        last = jnp.where(has_eos, pad_idx, eos_idx).astype(jnp.int32)
    return jnp.concatenate([captions, last[:, None]], axis=1)


def multimodal_beam_search_decode(
    module, params, video_memory, video_mask, audio_memory, audio_mask,
    seq_len, bos_idx, eos_idx, pad_idx, beam_size=4, length_penalty=0.0,
):
    """Batched beam search for the dual-memory multimodal decoder — the
    multimodal analog of caption_decoder.beam_search_decode (driver config #5
    names beam decode on the raw path; the reference is greedy-only).

    Beams of one event row are contiguous (row n -> n*K + k); per-modality
    memory k/v are projected once and repeated per beam; candidate expansion
    is one top_k over (K * vocab) per row and beam reordering is a cache
    gather — the whole search is a single early-exit lax.while_loop inside jit.

    Returns (N, seq_len + 1) captions of the best beam, same tail convention
    as multimodal_greedy_decode.
    """
    N, _, D = video_memory.shape
    depth, K = module.depth, beam_size
    NEG = jnp.float32(-1e9)

    vm = jnp.repeat(video_memory, K, axis=0)
    vmask = jnp.repeat(video_mask, K, axis=0)
    am = jnp.repeat(audio_memory, K, axis=0)
    amask = jnp.repeat(audio_mask, K, axis=0)
    NK = N * K

    mem_kv = module.apply(params, vm, am, method=_mm_precompute)
    _decode_pair = _mm_decode_pair_fn(mem_kv, vmask, amask)

    tokens = jnp.full((N, K, seq_len), pad_idx, dtype=jnp.int32).at[:, :, 0].set(bos_idx)
    # only beam 0 live at the start so the first expansion diversifies
    scores = jnp.where(jnp.arange(K)[None] == 0, 0.0, NEG) * jnp.ones((N, 1))
    done = jnp.zeros((N, K), dtype=bool)
    k_caches = jnp.zeros((depth, NK, seq_len, D), dtype=video_memory.dtype)
    v_caches = jnp.zeros((depth, NK, seq_len, D), dtype=video_memory.dtype)

    def step_fn(carry):
        t, tokens, scores, done, k_caches, v_caches = carry
        flat_prev = tokens.reshape(NK, seq_len)
        prev_tok = jnp.take_along_axis(
            flat_prev, (t - 1)[None, None].repeat(NK, 0), axis=1
        )[:, 0]
        pad_tok = jnp.full((NK,), pad_idx, dtype=jnp.int32)
        # fused commit(prev @ t-1) + predict(t): caches gain the t-1 entry
        logits, k_caches, v_caches = module.apply(
            params, prev_tok, pad_tok, t - 1, k_caches, v_caches,
            method=_decode_pair,
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(N, K, -1)
        V = logp.shape[-1]
        # finished beams only extend with <pad> at zero cost
        pad_only = jnp.full((V,), NEG).at[pad_idx].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None], logp)

        cand = (scores[..., None] + logp).reshape(N, K * V)
        new_scores, idx = jax.lax.top_k(cand, K)
        parent = idx // V
        new_tok = (idx % V).astype(jnp.int32)

        rowsN = jnp.arange(N)[:, None]
        tokens = tokens[rowsN, parent]
        done = done[rowsN, parent]
        flat_parent = (rowsN * K + parent).reshape(-1)
        k_caches = k_caches[:, flat_parent]
        v_caches = v_caches[:, flat_parent]

        new_tok = jnp.where(done, pad_idx, new_tok)
        tokens = tokens.at[:, :, t].set(new_tok)
        done = done | (new_tok == eos_idx)
        return (t + 1, tokens, new_scores, done, k_caches, v_caches)

    def step_cond(carry):
        # early exit once every beam of every row is finished (mirrors
        # caption_decoder.beam_search_decode; outcome-identical — finished
        # beams only extend with zero-cost <pad>)
        t, _, _, done, _, _ = carry
        return (t < seq_len) & ~jnp.all(done)

    _, tokens, scores, done, _, _ = jax.lax.while_loop(
        step_cond, step_fn,
        (jnp.int32(1), tokens, scores, done, k_caches, v_caches),
    )

    if length_penalty:
        lengths = jnp.sum(tokens != pad_idx, axis=-1).astype(jnp.float32)
        norm = ((5.0 + lengths) / 6.0) ** length_penalty
        ranked = scores / norm
    else:
        ranked = scores
    best = jnp.argmax(ranked, axis=1)
    captions = tokens[jnp.arange(N), best]

    has_eos = jnp.any(captions == eos_idx, axis=1)
    last = jnp.where(has_eos, pad_idx, eos_idx).astype(jnp.int32)
    return jnp.concatenate([captions, last[:, None]], axis=1)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

class MultimodalDVC:
    """Functional orchestrator for the video+audio family (multimodal analog
    of UnimodalDVC; reference models/sparse/multimodal_sparse_dvc.py intent)."""

    def __init__(
        self, cfg, vocab_size: int, pad_idx: int, bos_idx: int, eos_idx: int,
        embedding_matrix: Optional[np.ndarray] = None,
    ):
        dvc = cfg.dvc
        det = dvc.detr
        anet = cfg.dataset.activity_net
        self.cfg = cfg
        self.pad_idx, self.bos_idx, self.eos_idx = pad_idx, bos_idx, eos_idx
        self.max_gt = anet.max_gt_target_segments
        self.seq_len = anet.max_caption_len_all
        self.video_rescale_len = det.video_rescale_len
        self.audio_rescale_len = anet.audio_rescale_len
        self.num_feature_levels = det.num_feature_levels
        self.aux_loss = dvc.aux_loss
        self.use_differentiable_mask = cfg.use_differentiable_mask
        self.cost_segment = float(dvc.matcher.cost_segment)
        self.cost_giou = float(dvc.matcher.cost_giou)
        self.num_queries = dvc.num_queries

        self.video_shapes = pyramid_shapes(det.video_rescale_len, det.num_feature_levels)
        self.audio_shapes = pyramid_shapes(anet.audio_rescale_len, det.num_feature_levels)
        self.num_tokens_video = int(sum(self.video_shapes))
        self.num_tokens_audio = int(sum(self.audio_shapes))

        self.proposal_net = MultimodalProposalNet(
            d_model=dvc.d_model,
            num_queries=dvc.num_queries,
            num_feature_levels=det.num_feature_levels,
            num_heads=det.num_heads,
            enc_layers=det.enc_layers,
            dec_layers=det.dec_layers,
            ff_dim=det.transformer_ff_dim,
            dropout=det.transformer_dropout_prob,
            enc_n_points=det.enc_n_points,
            dec_n_points=det.dec_n_points,
            rho=det.rho if dvc.use_sparse_detr else 0.0,
            max_eseq_length=dvc.max_eseq_length,
            video_rescale_len=det.video_rescale_len,
            audio_rescale_len=anet.audio_rescale_len,
            msda_backend=cfg.msda_backend,
        )
        # optional BiModalEncoder fusion ahead of the proposal stack — the
        # reference ships the module but never wires it (models/regular/
        # dvc.py:55 "TODO - add bimodal encoder"); this realizes that intent:
        # video<->audio cross-attention over the modality token streams
        # before the per-modality pyramids
        self.use_bimodal_encoder = bool(getattr(dvc, "use_bimodal_encoder", False))
        if self.use_bimodal_encoder:
            from .backbones import BiModalEncoder

            self.bimodal_encoder = BiModalEncoder(
                d_model=det.feature_dim,
                depth=int(getattr(dvc, "bimodal_depth", 2)),
                num_heads=det.num_heads,
            )

        cap = dvc.caption
        self.caption_decoder = MultimodalCaptionDecoder(
            vocab_size=vocab_size, seq_len=self.seq_len, d_model=cap.d_model,
            depth=cap.depth, num_heads=cap.num_heads,
            mlp_ratio=float(cap.mlp_ratio), qkv_bias=cap.qkv_bias,
            positional_embedding_dropout=cap.positional_embedding_dropout,
            attention_dropout=cap.attention_dropout,
            projection_dropout=cap.projection_dropout,
            bridge_dropout=cap.bridge_dropout,
            mlp_dropout_1=cap.mlp_dropout_1, mlp_dropout_2=cap.mlp_dropout_2,
            return_intermediate=cap.return_intermediate,
            pretrained_matrix=embedding_matrix,
        )
        if self.use_differentiable_mask:
            self.video_context_mask_model = ContextMaskModel(self.num_tokens_video)
            self.audio_context_mask_model = ContextMaskModel(self.num_tokens_audio)

    def init(self, rng, batch) -> Dict:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        params = {}
        if self.use_bimodal_encoder:
            r1, r5 = jax.random.split(r1)
            params["bimodal"] = jax.jit(self.bimodal_encoder.init)(
                r5, batch["video_tensor"], batch["audio_tensor"]
            )
        params["proposal"] = jax.jit(self.proposal_net.init)(
            r1, batch["video_tensor"], batch["video_mask"],
            batch["audio_tensor"], batch["audio_mask"], batch["durations"],
        )
        B = batch["video_tensor"].shape[0]
        N = B * self.max_gt
        D = self.cfg.dvc.d_model
        tok = jnp.zeros((N, self.seq_len - 1), dtype=jnp.int32)
        vmem = jnp.zeros((N, self.num_tokens_video, D))
        amem = jnp.zeros((N, self.num_tokens_audio, D))
        params["caption"] = jax.jit(self.caption_decoder.init)(r2, tok, vmem, amem)
        if self.use_differentiable_mask:
            dummy = jnp.zeros((N, 2 + D))
            params["video_context_mask"] = jax.jit(self.video_context_mask_model.init)(r3, dummy)
            params["audio_context_mask"] = jax.jit(self.audio_context_mask_model.init)(r4, dummy)
        return params

    def _propose_and_match(self, params, batch, deterministic, rngs=None):
        video, audio = batch["video_tensor"], batch["audio_tensor"]
        if self.use_bimodal_encoder:
            video, audio = self.bimodal_encoder.apply(
                params["bimodal"], video, audio, deterministic, rngs=rngs
            )
        out = self.proposal_net.apply(
            params["proposal"],
            video, batch["video_mask"],
            audio, batch["audio_mask"], batch["durations"],
            deterministic, rngs=rngs,
        )
        indices = hungarian_match(
            out["pred_segments"], batch["gt_segments"], batch["gt_mask"],
            self.cost_segment, self.cost_giou,
        )
        indices_aux = None
        if self.aux_loss:
            aux_seg = out["outputs_segment_all"][:-1]
            Lm1, B = aux_seg.shape[0], aux_seg.shape[1]
            flat = aux_seg.reshape(Lm1 * B, self.num_queries, 2)
            indices_aux = hungarian_match(
                flat, jnp.tile(batch["gt_segments"], (Lm1, 1, 1)),
                jnp.tile(batch["gt_mask"], (Lm1, 1)),
                self.cost_segment, self.cost_giou,
            ).reshape(Lm1, B, self.max_gt)
        return out, indices, indices_aux

    def _prepare_caption_inputs(self, params, out, batch, indices):
        B, G = indices.shape
        rows = jnp.arange(B)[:, None]
        matched = out["pred_segments"][rows, indices]
        denorm = denormalize_segments(matched, batch["durations"][:, None])

        v_crop, v_mask = crop_segments(
            out["video_memory"], denorm, batch["durations"],
            self.video_rescale_len, self.num_feature_levels,
        )
        a_crop, a_mask = crop_segments(
            out["audio_memory"], denorm, batch["durations"],
            self.audio_rescale_len, self.num_feature_levels,
        )
        N = B * G
        v_crop = v_crop.reshape(N, -1, v_crop.shape[-1])
        a_crop = a_crop.reshape(N, -1, a_crop.shape[-1])
        v_mask = v_mask.reshape(N, -1)
        a_mask = a_mask.reshape(N, -1)

        v_pred = a_pred = None
        v_cap_mask, a_cap_mask = v_mask, a_mask
        if self.use_differentiable_mask:
            qf = out["query_features"][-1][rows, indices].reshape(N, -1)
            cm_in = jnp.concatenate([denorm.reshape(N, 2), qf], axis=1)
            v_pred = self.video_context_mask_model.apply(params["video_context_mask"], cm_in)
            a_pred = self.audio_context_mask_model.apply(params["audio_context_mask"], cm_in)
            v_cap_mask = nn.sigmoid(v_pred) > 0.5
            a_cap_mask = nn.sigmoid(a_pred) > 0.5
        return (v_crop, v_mask, v_cap_mask, v_pred), (a_crop, a_mask, a_cap_mask, a_pred)

    def _aux_outputs(self, out, outputs_caption, caption_head=None):
        # NOTE: the "caption_head" marker is train-only — eval `out` dicts are
        # returned from jitted functions (e.g. tests/test_sharding.py) where a
        # string leaf would be an invalid JAX output type.
        aux = [
            {"pred_segments": out["outputs_segment_all"][i],
             "pred_count": out["outputs_count_all"][i]}
            for i in range(out["outputs_segment_all"].shape[0] - 1)
        ]
        mark = {"caption_head": caption_head} if caption_head else {}
        aux_cap = [
            {"pred_captions": outputs_caption[i], **mark}
            for i in range(outputs_caption.shape[0] - 1)
        ]
        return aux, aux_cap

    def forward_train(self, params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng}
        out, indices, indices_aux = self._propose_and_match(params, batch, False, rngs)
        (v_crop, v_mask, v_cap_mask, v_pred), (a_crop, a_mask, a_cap_mask, a_pred) = (
            self._prepare_caption_inputs(params, out, batch, indices)
        )
        if v_pred is not None:
            out["video_pred_memory_mask"] = v_pred
            out["audio_pred_memory_mask"] = a_pred

        cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
        tgt = cap_tokens[:, :-1]
        outputs_caption = self.caption_decoder.apply(
            params["caption"], tgt, v_crop, a_crop,
            make_causal_mask(self.seq_len - 1), tgt == self.pad_idx,
            v_cap_mask, a_cap_mask, deterministic=False, return_logits=True,
            rngs=rngs,
        )  # raw compute-dtype logits — fused-loss train path (see criterion.py)
        out["pred_captions"] = outputs_caption[-1]
        out["caption_head"] = "logits"
        if self.aux_loss:
            aux, _ = self._aux_outputs(out, outputs_caption[:0])
            out["aux_outputs"] = aux
            # depth-vectorized caption losses (see criterion.py)
            out["pred_captions_all"] = outputs_caption
        memory_mask = (v_mask.astype(jnp.float32), a_mask.astype(jnp.float32))
        return out, indices, indices_aux, memory_mask

    def forward_eval(
        self,
        params,
        batch,
        val_mode: str = "one_by_one",
        faster_eval: bool = False,
        beam_size: int = 0,
        length_penalty: float = 0.0,
    ):
        out, indices, indices_aux = self._propose_and_match(params, batch, True)
        (v_crop, v_mask, v_cap_mask, v_pred), (a_crop, a_mask, a_cap_mask, a_pred) = (
            self._prepare_caption_inputs(params, out, batch, indices)
        )
        if v_pred is not None:
            out["video_pred_memory_mask"] = v_pred
            out["audio_pred_memory_mask"] = a_pred

        cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
        tgt = cap_tokens[:, :-1]
        outputs_caption = self.caption_decoder.apply(
            params["caption"], tgt, v_crop, a_crop,
            make_causal_mask(self.seq_len - 1), tgt == self.pad_idx,
            v_cap_mask, a_cap_mask,
        )
        if val_mode == "one_by_one":
            captions_with_eos = multimodal_greedy_decode(
                self.caption_decoder, params["caption"],
                v_crop, v_cap_mask, a_crop, a_cap_mask,
                self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                faster_eval=faster_eval,
            )
        elif val_mode == "beam":
            captions_with_eos = multimodal_beam_search_decode(
                self.caption_decoder, params["caption"],
                v_crop, v_cap_mask, a_crop, a_cap_mask,
                self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                beam_size=beam_size or 4, length_penalty=length_penalty,
            )
        elif val_mode == "teacher_forcing":
            captions_with_eos = jnp.argmax(outputs_caption[-1], axis=-1)
        else:
            raise ValueError(f"bad val_mode {val_mode!r}")

        out["pred_captions"] = outputs_caption[-1]
        if self.aux_loss:
            out["aux_outputs"], out["aux_outputs_caption"] = self._aux_outputs(out, outputs_caption)
        memory_mask = (v_mask.astype(jnp.float32), a_mask.astype(jnp.float32))
        return out, captions_with_eos, indices, indices_aux, memory_mask


class RawMultimodalDVC(MultimodalDVC):
    """Full raw pipeline (BASELINE config #5): raw frames -> ViViT features,
    log-mel fbank -> AST features, then the multimodal DVC stack.  The
    backbones run inside the same jitted forward; frame normalization and the
    fbank are jnp (data/video_transforms.py, data/audio.py), so from pixels +
    spectrogram to captions is one XLA program."""

    def __init__(self, cfg, vocab_size, pad_idx=1, bos_idx=2, eos_idx=3,
                 embedding_matrix=None):
        super().__init__(cfg, vocab_size, pad_idx, bos_idx, eos_idx, embedding_matrix)
        from .backbones import AudioSpectrogramTransformer, VideoVisionTransformer

        viv = cfg.dvc.vivit
        ast = cfg.dvc.ast
        self.video_backbone = VideoVisionTransformer(
            model_name=viv.model_name, d_model=cfg.dvc.d_model,
            depth=viv.depth, temporal_depth=viv.temporal_depth,
            num_heads=viv.num_heads,
            spatial_patch_size=viv.spatial_patch_size,
            temporal_patch_size=viv.temporal_patch_size,
        )
        self.audio_backbone = AudioSpectrogramTransformer(
            d_model=cfg.dvc.d_model, depth=ast.depth, num_heads=ast.num_heads,
            patch_size=ast.patch_size, frequency_stride=ast.frequency_stride,
            time_stride=ast.time_stride,
        )

    def init(self, rng, batch):
        rb, rv, ra = jax.random.split(rng, 3)
        vfeat, afeat, pb = self._init_backbones(rv, ra, batch)
        feat_batch = dict(batch)
        feat_batch["video_tensor"] = vfeat
        feat_batch["audio_tensor"] = afeat
        feat_batch["video_mask"] = jnp.zeros(vfeat.shape[:2], dtype=bool)
        feat_batch["audio_mask"] = jnp.zeros(afeat.shape[:2], dtype=bool)
        params = super().init(rb, feat_batch)
        params.update(pb)
        return params

    def _init_backbones(self, rv, ra, batch):
        from ..data.video_transforms import normalize

        frames = batch["video_tensor"]
        if frames.dtype == jnp.uint8:
            frames = normalize(frames)
        pv = jax.jit(self.video_backbone.init)(rv, frames)
        pa = jax.jit(self.audio_backbone.init)(ra, batch["audio_tensor"])
        vfeat = self.video_backbone.apply(pv, frames)
        afeat = self.audio_backbone.apply(pa, batch["audio_tensor"])
        return vfeat, afeat, {"video_backbone": pv, "audio_backbone": pa}

    def _propose_and_match(self, params, batch, deterministic, rngs=None):
        from ..data.video_transforms import normalize

        frames = batch["video_tensor"]
        if frames.dtype == jnp.uint8:
            frames = normalize(frames)
        vfeat = self.video_backbone.apply(
            params["video_backbone"], frames, deterministic, rngs=rngs
        )
        afeat = self.audio_backbone.apply(
            params["audio_backbone"], batch["audio_tensor"], deterministic, rngs=rngs
        )
        feat_batch = dict(batch)
        feat_batch["video_tensor"] = vfeat
        feat_batch["audio_tensor"] = afeat
        feat_batch["video_mask"] = jnp.zeros(vfeat.shape[:2], dtype=bool)
        feat_batch["audio_mask"] = jnp.zeros(afeat.shape[:2], dtype=bool)
        # forward_train/forward_eval are inherited: they call this override for
        # the proposal stage and use the original batch only for durations/
        # captions/GT, which are backbone-independent. Config requirement: the
        # ViViT/AST output token counts must equal video/audio_rescale_len so
        # the pyramid and crop windows line up.
        return super()._propose_and_match(params, feat_batch, deterministic, rngs)


def build_multimodal_model(cfg, vocab_size, pad_idx=1, bos_idx=2, eos_idx=3, embedding_matrix=None):
    if cfg.use_raw_videos:
        return RawMultimodalDVC(cfg, vocab_size, pad_idx, bos_idx, eos_idx, embedding_matrix)
    return MultimodalDVC(cfg, vocab_size, pad_idx, bos_idx, eos_idx, embedding_matrix)
