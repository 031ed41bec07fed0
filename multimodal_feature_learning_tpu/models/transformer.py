"""Deformable proposal transformer (dense + Sparse-DETR variants).

Behavioral spec: reference
``models/sparse/unimodal_sparse_deformable_transformer.py`` (sparse encoder
with top-rho token selection and scatter-back, :210-218 / :425-450; grid
proposals :101-145; MaskPredictor :634-657; decoder :474-631) and
``models/deformable/unimodal_deformable_transformer.py`` (dense encoder).

TPU-native deltas (static shapes for jit):
  * the sparse token budget K = int(rho * S) + 1 is static (the reference uses
    the batch max of per-sample counts); per-sample counts still gate the
    scatter-back exactly as in the reference, so extra slots are dead compute,
    not behavior.
  * ``gen_encoder_output_proposals`` replicates the reference's scrambled
    1-D pairing by default (its validity mask gates the saliency-net input;
    see the function docstring); the intended pairing is available via
    ``scrambled=False``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment_ops import inverse_sigmoid
from .layers import CrossAttention, FFN, MaskPredictor
from .msda_module import MSDeformAttn


# ---------------------------------------------------------------------------
# functional helpers (pure, shape-static)
# ---------------------------------------------------------------------------

def get_valid_ratios(masks) -> jnp.ndarray:
    """(B, L): fraction of non-pad tokens per level. Reference :147-150."""
    return jnp.stack(
        [jnp.sum(~m, axis=1).astype(jnp.float32) / m.shape[1] for m in masks], axis=1
    )


def get_encoder_reference_points(temporal_shapes, valid_ratios) -> jnp.ndarray:
    """(B, S, L, 1) normalized per-level reference points. Reference :374-391."""
    refs = []
    for lvl, T in enumerate(temporal_shapes):
        T = int(T)
        ref = jnp.linspace(0.5, T - 0.5, T)[None]  # (1, T)
        ref = ref / (valid_ratios[:, None, lvl] * T)  # (B, T)
        refs.append(ref)
    reference_points = jnp.concatenate(refs, axis=1)  # (B, S)
    reference_points = reference_points[:, :, None] * valid_ratios[:, None]  # (B,S,L)
    return reference_points[..., None]


def gen_encoder_output_proposals(temporal_shapes, memory_padding_mask,
                                 scrambled: bool = True):
    """Grid (center, width) proposal bases per token + validity.

    Returns (proposals_unact (B, S, 2) in logit space with +inf at invalid,
             proposal_valid (B, S) bool).

    ``scrambled=True`` (default) reproduces the reference bit-for-bit: its 1-D
    port pairs values via a flat ``cat((grid, wh), -1).view(N, -1, 2)``
    (unimodal_sparse_deformable_transformer.py:129), which interleaves
    (grid[2i], grid[2i+1]) pairs in the first half and (wh, wh) pairs in the
    second half of each level.  This matters beyond the enc-aux bases: the
    per-token validity derived from these pairs gates the memory zeroing that
    feeds the Sparse-DETR saliency predictor, i.e. it shapes the top-rho token
    selection of the live path.  ``scrambled=False`` gives the intended
    (center, width) pairing.
    """
    B = memory_padding_mask.shape[0]
    proposals = []
    cur = 0
    for lvl, T in enumerate(temporal_shapes):
        T = int(T)
        mask_l = memory_padding_mask[:, cur : cur + T]  # (B, T)
        valid_L = jnp.sum(~mask_l, axis=1).astype(jnp.float32)  # (B,)
        grid = jnp.arange(T, dtype=jnp.float32)[None]  # (1, T) == linspace(0,T-1,T)
        grid = (grid + 0.5) / valid_L[:, None]  # (B, T)
        wh = jnp.full_like(grid, 0.05 * (2.0**lvl))
        if scrambled:
            flat = jnp.concatenate(
                [jnp.broadcast_to(grid, (B, T)), jnp.broadcast_to(wh, (B, T))], axis=1
            )  # (B, 2T)
            proposals.append(flat.reshape(B, T, 2))
        else:
            proposals.append(
                jnp.broadcast_to(jnp.stack([grid, wh], axis=-1), (B, T, 2))
            )
        cur += T
    output_proposals = jnp.concatenate(proposals, axis=1)  # (B, S, 2)
    valid = jnp.all(
        (output_proposals > 0.01) & (output_proposals < 0.99), axis=-1
    )  # (B, S)
    unact = jnp.log(output_proposals / (1 - output_proposals))
    unact = jnp.where(memory_padding_mask[..., None], jnp.inf, unact)
    unact = jnp.where(~valid[..., None], jnp.inf, unact)
    return unact, valid


def predict_event_num(counter: nn.Module, query_features: jnp.ndarray) -> jnp.ndarray:
    """Max-pool queries then linear head; reference misc_modules.py:41-45.
    query_features: (..., Q, D) -> (..., max_eseq + 1)."""
    pooled = jnp.max(query_features, axis=-2)
    return counter(pooled)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class DeformableTransformerEncoderLayer(nn.Module):
    """MSDA self-attn + FFN; reference :285-359."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_backend: str = ""

    def setup(self):
        self.self_attn = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            backend=self.msda_backend,
        )
        self.dropout1 = nn.Dropout(self.dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(self.d_ffn)
        self.dropout2 = nn.Dropout(self.dropout)
        self.linear2 = nn.Dense(self.d_model)
        self.dropout3 = nn.Dropout(self.dropout)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)

    def _ffn(self, x, deterministic):
        h = self.linear2(self.dropout2(nn.relu(self.linear1(x)), deterministic=deterministic))
        x = x + self.dropout3(h, deterministic=deterministic)
        return self.norm2(x)

    def __call__(
        self,
        src,                # (B, S, D) dense memory (the value set)
        pos,                # (B, Q, D) pos embed of the queries
        reference_points,   # (B, Q, L, 1)
        temporal_shapes,
        padding_mask=None,  # (B, S)
        tgt=None,           # (B, Q, D) sparse queries; None = dense self-attn
        deterministic: bool = True,
    ):
        q_in = src if tgt is None else tgt
        q = q_in + pos if pos is not None else q_in
        out, loc, attn = self.self_attn(
            q, reference_points, src, temporal_shapes, padding_mask
        )
        x = q_in + self.dropout1(out, deterministic=deterministic)
        x = self.norm1(x)
        x = self._ffn(x, deterministic)
        return x, loc, attn


class DeformableTransformerDecoderLayer(nn.Module):
    """Vanilla self-attn over queries + MSDA cross-attn + FFN; reference :474-551."""

    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_backend: str = ""

    def setup(self):
        self.cross_attn = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            backend=self.msda_backend,
        )
        self.dropout1 = nn.Dropout(self.dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.self_attn = CrossAttention(
            self.d_model, self.n_heads, qkv_bias=True,
            attention_dropout=self.dropout,
        )
        self.dropout2 = nn.Dropout(self.dropout)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(self.d_ffn)
        self.dropout3 = nn.Dropout(self.dropout)
        self.linear2 = nn.Dense(self.d_model)
        self.dropout4 = nn.Dropout(self.dropout)
        self.norm3 = nn.LayerNorm(epsilon=1e-5)

    def _ffn(self, x, deterministic):
        h = self.linear2(self.dropout3(nn.relu(self.linear1(x)), deterministic=deterministic))
        x = x + self.dropout4(h, deterministic=deterministic)
        return self.norm3(x)

    def __call__(
        self,
        tgt,                 # (B, Q, D)
        query_pos,           # (B, Q, D)
        reference_points,    # (B, Q, L, 1)
        src,                 # (B, S, D)
        temporal_shapes,
        src_padding_mask=None,
        query_padding_mask=None,  # (B, Q) True = masked
        deterministic: bool = True,
    ):
        q = tgt + query_pos if query_pos is not None else tgt
        sa = self.self_attn(
            q, q, tgt, key_padding_mask=query_padding_mask,
            deterministic=deterministic,
        )
        tgt = self.norm2(tgt + self.dropout2(sa, deterministic=deterministic))

        q2 = tgt + query_pos if query_pos is not None else tgt
        ca, loc, attn = self.cross_attn(
            q2, reference_points, src, temporal_shapes, src_padding_mask
        )
        tgt = self.norm1(tgt + self.dropout1(ca, deterministic=deterministic))
        tgt = self._ffn(tgt, deterministic)
        return tgt, loc, attn


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

class SparseDeformableTransformer(nn.Module):
    """Deformable transformer with optional Sparse-DETR encoder sparsification.

    rho == 0 degrades to the dense deformable family
    (models/deformable/unimodal_deformable_transformer.py).
    """

    d_model: int = 512
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    rho: float = 0.5
    use_enc_aux_loss: bool = False
    return_intermediate_dec: bool = True
    msda_backend: str = ""
    # optional iterative segment refinement heads in the decoder (the sparse
    # reference model leaves decoder.bbox_head unset -> refinement off)
    with_segment_refinement: bool = False

    def setup(self):
        self.level_embed = self.param(
            "level_embed",
            nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
        )
        self.enc_layers = [
            DeformableTransformerEncoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.num_heads, self.enc_n_points,
                self.msda_backend,
            )
            for _ in range(self.num_encoder_layers)
        ]
        self.dec_layers = [
            DeformableTransformerDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.num_heads, self.dec_n_points,
                self.msda_backend,
            )
            for _ in range(self.num_decoder_layers)
        ]
        if self.rho:
            self.enc_mask_predictor = MaskPredictor(self.d_model)
        self.enc_output = nn.Dense(self.d_model)
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5)
        self.reference_points_head = nn.Dense(1)
        if self.with_segment_refinement:
            self.refine_heads = [
                FFN(self.d_model, 2, 3) for _ in range(self.num_decoder_layers)
            ]

    # -- encoder-side preparation ---------------------------------------------

    def prepare_encoder_inputs(self, srcs, masks, poses):
        """Flatten levels, add level embeds, compute sparse top-K selection.

        Returns a dict: src_flatten (B,S,D), mask_flatten (B,S),
        lvl_pos_flatten (B,S,D), valid_ratios (B,L), temporal_shapes (static),
        backbone_output_proposals (B,S,2), backbone_topk_proposals (B,K),
        backbone_mask_prediction (B,S), sparse_token_nums (B,).
        Reference :152-227.
        """
        temporal_shapes = tuple(int(s.shape[1]) for s in srcs)
        src_flatten = jnp.concatenate(srcs, axis=1)
        mask_flatten = jnp.concatenate(masks, axis=1)
        lvl_pos = [
            pos + self.level_embed[lvl][None, None]
            for lvl, pos in enumerate(poses)
        ]
        lvl_pos_flatten = jnp.concatenate(lvl_pos, axis=1)
        valid_ratios = get_valid_ratios(masks)

        out = {
            "src_flatten": src_flatten,
            "mask_flatten": mask_flatten,
            "lvl_pos_flatten": lvl_pos_flatten,
            "valid_ratios": valid_ratios,
            "temporal_shapes": temporal_shapes,
            "backbone_output_proposals": None,
            "backbone_topk_proposals": None,
            "backbone_mask_prediction": None,
            "sparse_token_nums": None,
        }

        if self.rho or self.use_enc_aux_loss:
            proposals_unact, _ = gen_encoder_output_proposals(
                temporal_shapes, mask_flatten
            )
            out["backbone_output_proposals"] = proposals_unact
            valid_token_nums = jnp.sum(~mask_flatten, axis=1)  # (B,)

        if self.rho:
            S = src_flatten.shape[1]
            K = min(int(S * self.rho) + 1, S)  # static budget >= batch max
            sparse_token_nums = (
                valid_token_nums.astype(jnp.float32) * self.rho
            ).astype(jnp.int32) + 1
            # saliency over processed memory (memory+pos), pad region excluded
            backbone_output_memory = src_flatten + lvl_pos_flatten
            proposal_valid = jnp.isfinite(proposals_unact).all(-1)
            backbone_output_memory = jnp.where(
                (mask_flatten | ~proposal_valid)[..., None],
                0.0,
                backbone_output_memory,
            )
            backbone_output_memory = self.enc_output_norm(
                self.enc_output(backbone_output_memory)
            )
            saliency = self.enc_mask_predictor(backbone_output_memory)  # (B, S)
            # pad area excluded with the GLOBAL min, as the reference (:217)
            saliency = jnp.where(mask_flatten, jnp.min(saliency), saliency)
            _, topk_idx = jax.lax.top_k(saliency, K)  # (B, K)
            out["backbone_mask_prediction"] = saliency
            out["backbone_topk_proposals"] = topk_idx
            out["sparse_token_nums"] = sparse_token_nums

        return out

    # -- encoder ----------------------------------------------------------------

    def forward_encoder(self, enc_inputs, deterministic: bool = True):
        """Sparse (or dense) encoder stack.

        Returns (memory (B,S,D), sampling_locations (B,layers,Q,H,L,P),
        attn_weights (B,layers,Q,H,L,P), enc_inter_counts, enc_inter_segments,
        enc_inter_topk_proposals).
        Reference :393-470.
        """
        src = enc_inputs["src_flatten"]
        mask_flatten = enc_inputs["mask_flatten"]
        pos = enc_inputs["lvl_pos_flatten"]
        valid_ratios = enc_inputs["valid_ratios"]
        temporal_shapes = enc_inputs["temporal_shapes"]
        topk = enc_inputs["backbone_topk_proposals"]
        sparse_token_nums = enc_inputs["sparse_token_nums"]
        output_proposals = enc_inputs["backbone_output_proposals"]

        output = src
        reference_points = get_encoder_reference_points(temporal_shapes, valid_ratios)

        sparse = topk is not None
        if sparse:
            B, K = topk.shape
            rows = jnp.arange(B)[:, None]
            ref_q = reference_points[rows, topk]  # (B, K, L, 1)
            tgt = output[rows, topk]  # (B, K, D)
            pos_q = pos[rows, topk]
            keep = jnp.arange(K)[None, :] < sparse_token_nums[:, None]  # (B, K)
            if output_proposals is not None:
                proposals_q = output_proposals[rows, topk]  # (B, K, 2)
        else:
            ref_q, tgt, pos_q, keep = reference_points, None, pos, None

        locs, attns = [], []
        inter_tgts = []
        for layer in self.enc_layers:
            tgt_out, loc, attn = layer(
                output, pos_q, ref_q, temporal_shapes, mask_flatten,
                tgt=tgt if sparse else None, deterministic=deterministic,
            )
            locs.append(loc)
            attns.append(attn)
            if sparse:
                tgt = tgt_out
                # scatter updated sparse tokens back into the dense memory,
                # only the first sparse_token_nums[b] slots (reference :441-448)
                old = jnp.take_along_axis(output, topk[..., None], axis=1)
                vals = jnp.where(keep[..., None], tgt_out, old)
                output = output.at[rows, topk].set(vals)
            else:
                output = tgt_out
            if self.use_enc_aux_loss:
                inter_tgts.append(tgt_out)

        enc_inter_counts = None
        enc_inter_segments = None
        if self.use_enc_aux_loss and inter_tgts:
            # heads applied by the DVC parent; here we expose stacked
            # per-layer token features (all but the last, reference :459-461)
            # plus the proposal bases for the sigmoid offsetting.
            stacked = jnp.stack(inter_tgts[:-1])  # (layers-1, B, K(orS), D)
            bases = proposals_q if sparse else output_proposals
            enc_inter_counts = stacked
            enc_inter_segments = bases

        sampling_locations = jnp.stack(locs, axis=1)  # (B, layers, Q, H, L, P)
        attn_weights = jnp.stack(attns, axis=1)
        return output, sampling_locations, attn_weights, enc_inter_counts, enc_inter_segments

    # -- decoder ----------------------------------------------------------------

    def prepare_decoder_input_query(self, batch_size: int, query_embed: jnp.ndarray):
        """Split learned query embedding into (pos, tgt) and init reference
        points via a Linear+sigmoid. Reference :252-269."""
        query_pos, tgt = jnp.split(query_embed, 2, axis=1)  # (Q, D) each
        query_pos = jnp.broadcast_to(
            query_pos[None], (batch_size,) + query_pos.shape
        )
        tgt = jnp.broadcast_to(tgt[None], (batch_size,) + tgt.shape)
        # reference points stay f32 under a bf16 trunk: they feed sampling
        # locations and the inverse-sigmoid offset chain in the parent
        reference_points = nn.sigmoid(
            self.reference_points_head(query_pos).astype(jnp.float32)
        )  # (B,Q,1)
        return reference_points, tgt, reference_points, query_pos

    def forward_decoder(
        self,
        tgt,                  # (B, Q, D)
        reference_points,     # (B, Q, 1)
        memory,               # (B, S, D)
        temporal_shapes,
        valid_ratios,         # (B, L)
        query_pos,            # (B, Q, D)
        mask_flatten,         # (B, S)
        query_padding_mask=None,   # (B, Q) True=masked
        disable_iterative_refine: bool = False,
        deterministic: bool = True,
    ):
        """Returns (intermediate (layers,B,Q,D), inter_references (layers,B,Q,1),
        sampling_locations (B,layers,Q,H,L,P), attn_weights)."""
        output = tgt
        intermediate, inter_refs, locs, attns = [], [], [], []
        for lid, layer in enumerate(self.dec_layers):
            # (B, Q, L, 1): scale reference by per-level valid ratios
            ref_input = reference_points[:, :, None, :] * valid_ratios[:, None, :, None]
            output, loc, attn = layer(
                output, query_pos, ref_input, memory, temporal_shapes,
                mask_flatten, query_padding_mask, deterministic=deterministic,
            )
            locs.append(loc)
            attns.append(attn)
            if self.with_segment_refinement and not disable_iterative_refine:
                tmp = self.refine_heads[lid](output)  # (B, Q, 2)
                new_ref = tmp[..., :1] + inverse_sigmoid(reference_points)
                reference_points = jax.lax.stop_gradient(nn.sigmoid(new_ref))
            intermediate.append(output)
            inter_refs.append(reference_points)

        return (
            jnp.stack(intermediate),
            jnp.stack(inter_refs),
            jnp.stack(locs, axis=1),
            jnp.stack(attns, axis=1),
        )
