"""UnimodalDVC: the full dense-video-captioning pipeline, jit-end-to-end.

Behavioral spec: reference ``models/sparse/unimodal_sparse_dvc.py:111-391``
(and the dense variant ``models/deformable/unimodal_deformable_dvc.py``):
base encoder -> (sparse) deformable transformer -> segment/count heads with
reference-point offsetting -> Hungarian matching -> per-event memory crop ->
caption decoding (teacher forcing in training; greedy at eval).

Architecture: a functional orchestrator over three flax modules
(``ProposalNet``, ``UnimodalCaptionDecoder``, ``ContextMaskModel``) rather
than one god-module — matching, cropping, and greedy decoding are pure
functions between the applies, and the whole train/eval step jits as one XLA
program (the reference syncs to CPU for scipy matching mid-forward).

Static-shape contract (TPU-first): every video contributes exactly
``max_gt`` caption slots gated by ``gt_mask`` — the reference's dynamic
``total_caption_num`` becomes the fixed N = B * max_gt with validity masks.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment_ops import denormalize_segments, inverse_sigmoid
from ..utils.precision import cast_floating, resolve_dtype
from .base_encoder import BaseEncoder, pyramid_shapes
from .caption_decoder import (
    UnimodalCaptionDecoder,
    beam_search_decode,
    greedy_decode,
    greedy_decode_chunk,
    make_causal_mask,
)
from .layers import ContextMaskModel, FFN
from .matcher import hungarian_match
from .transformer import SparseDeformableTransformer, predict_event_num


def level_windows(video_rescale_len: int, num_levels: int):
    """Static per-level [lower, upper) windows in the flattened token axis.
    Reference crop_segments (unimodal_sparse_dvc.py:504-507), including its
    formula quirks (the level-3 upper bound is floor(vrl*15/8), one short of
    the true level end)."""
    wins = []
    for n in range(num_levels):
        lower = math.floor(video_rescale_len * ((2**n - 1) / 2 ** (n - 1)))
        upper = math.floor(video_rescale_len * ((2 ** (n + 1) - 1) / 2**n))
        wins.append((lower, upper))
    return wins


def crop_segment_mask(
    denorm_segments: jnp.ndarray,  # (B, G, 2) seconds
    durations: jnp.ndarray,     # (B,)
    video_rescale_len: int,
    num_levels: int,
    num_tokens: int = 0,
) -> jnp.ndarray:
    """Per-event crop mask: True outside the event's token window at every
    pyramid level. Vectorized port of the reference's python double loop
    (unimodal_sparse_dvc.py:480-516). Returns (B, G, S) True=outside.

    num_tokens: true flattened pyramid length (may exceed the last window's
    upper bound — the reference's level-3 formula quirk leaves the final
    token permanently outside every crop)."""
    G = denorm_segments.shape[1]
    dur = durations[:, None]  # (B, 1)
    windows = level_windows(video_rescale_len, num_levels)
    S = num_tokens or windows[-1][1]
    toks = jnp.arange(S)[None, None]  # (1, 1, S)

    B = denorm_segments.shape[0]
    inside = jnp.zeros((B, G, S), dtype=bool)
    for lower, upper in windows:
        diff = upper - lower
        start = jnp.clip(
            jnp.round(lower + diff * denorm_segments[..., 0] / dur),
            lower, upper - 1,
        ).astype(jnp.int32)  # (B, G)
        end = jnp.clip(
            jnp.round(lower + diff * denorm_segments[..., 1] / dur),
            lower, upper - 1,
        ).astype(jnp.int32)
        inside = inside | ((toks >= start[..., None]) & (toks < end[..., None]))
    return ~inside


def crop_segments(
    memory: jnp.ndarray,        # (B, S, D)
    denorm_segments: jnp.ndarray,  # (B, G, 2) seconds
    durations: jnp.ndarray,     # (B,)
    video_rescale_len: int,
    num_levels: int,
):
    """Per-event memory crop: zero features outside the event's token window
    at every pyramid level (reference unimodal_sparse_dvc.py:480-516).

    Returns (cropped (B, G, S, D), pad_mask (B, G, S) True=outside).
    The flagship path no longer materializes this — it shares the per-video
    memory via grouped cross-attention (see crop_segment_mask); kept for the
    multimodal/regular families."""
    pad_mask = crop_segment_mask(
        denorm_segments, durations, video_rescale_len, num_levels,
        num_tokens=memory.shape[1],
    )
    cropped = jnp.where(~pad_mask[..., None], memory[:, None], 0.0)
    return cropped, pad_mask


class ProposalNet(nn.Module):
    """Base encoder + (sparse) deformable transformer + segment/count heads."""

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
    use_enc_aux_loss: bool = True
    max_eseq_length: int = 10
    video_rescale_len: int = 300
    msda_backend: str = ""
    # dense (deformable) family carries a per-query class head whose softmax
    # scores are exposed as pred_logits (unimodal_deformable_dvc.py:186-204);
    # the sparse family dropped it.
    with_class_head: bool = False
    num_classes: int = 200
    # optional sequence parallelism: constrain the flattened token axis of the
    # encoder memory onto the mesh 'model' axis (the CP analog — deformable
    # attention only touches +-P points per reference location, so GSPMD turns
    # the gathers/matmuls into halo-style collectives). Off by default; the
    # 15-30M-param model needs no TP/SP for parity (SURVEY §2.5).
    shard_tokens_axis: str = ""

    def setup(self):
        self.base_encoder = BaseEncoder(self.num_feature_levels, self.d_model)
        self.transformer = SparseDeformableTransformer(
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.ff_dim,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            dec_n_points=self.dec_n_points,
            enc_n_points=self.enc_n_points,
            rho=self.rho,
            use_enc_aux_loss=self.use_enc_aux_loss,
            msda_backend=self.msda_backend,
        )
        self.query_embedding = self.param(
            "query_embedding",
            nn.initializers.normal(1.0),
            (self.num_queries, self.d_model * 2),
        )
        self.segment_embedding_encoder = FFN(self.d_model, 2, 3, final_zero_init=True)
        self.segment_embedding_decoder = FFN(self.d_model, 2, 3, final_zero_init=True)
        self.count_head_encoder = nn.Dense(self.max_eseq_length + 1)
        self.count_head_decoder = nn.Dense(self.max_eseq_length + 1)
        if self.with_class_head:
            self.class_embedding = nn.Dense(self.num_classes + 1)

    def __call__(self, video, video_mask, durations, deterministic: bool = True):
        """
        Args:
          video: (B, T, feature_dim); video_mask: (B, T) True=pad;
          durations: (B,) seconds.

        Returns an ``out`` dict (pred_segments, pred_count, aux stacks,
        memory, query_features, sparse bookkeeping) — everything the matcher,
        crop, caption decoder and criterion need.
        """
        B = video.shape[0]
        srcs, masks, poses = self.base_encoder(video, video_mask, durations)
        enc_inputs = self.transformer.prepare_encoder_inputs(srcs, masks, poses)
        temporal_shapes = enc_inputs["temporal_shapes"]

        (memory, loc_enc, attn_enc, enc_inter_feats, enc_inter_bases) = (
            self.transformer.forward_encoder(enc_inputs, deterministic)
        )
        if self.shard_tokens_axis:
            from jax.sharding import PartitionSpec as P

            memory = jax.lax.with_sharding_constraint(
                memory, P(None, self.shard_tokens_axis, None)
            )

        init_ref, tgt, reference_points, query_pos = (
            self.transformer.prepare_decoder_input_query(B, self.query_embedding)
        )
        query_features, inter_references, loc_dec, attn_dec = (
            self.transformer.forward_decoder(
                tgt, reference_points, memory, temporal_shapes,
                enc_inputs["valid_ratios"], query_pos,
                enc_inputs["mask_flatten"], None, False, deterministic,
            )
        )  # (layers, B, Q, D), (layers, B, Q, 1)

        # segment/count head outputs and the reference-point sigmoid chain run
        # in f32 regardless of the trunk compute dtype (tiny tensors; the
        # matcher/criterion need full precision here)
        outputs_segment = self.segment_embedding_decoder(query_features).astype(
            jnp.float32
        )  # (layers,B,Q,2)
        outputs_count = predict_event_num(
            self.count_head_decoder, query_features
        ).astype(jnp.float32)

        # reference-point offsetting (unimodal_sparse_dvc.py:193-205):
        # ref[0] = init, ref[i] = inter[i-1]; with refinement off all equal.
        reference = jnp.concatenate(
            [init_ref[None], inter_references[:-1]], axis=0
        ).astype(jnp.float32)
        reference = inverse_sigmoid(reference)  # (layers, B, Q, 1)
        outputs_segment = outputs_segment + reference  # broadcasts over (c, l)
        outputs_segment = nn.sigmoid(outputs_segment)

        out = {
            "pred_segments": outputs_segment[-1],
            "pred_count": outputs_count[-1],
            "sampling_locations_enc": loc_enc,
            "attn_weights_enc": attn_enc,
            "sampling_locations_dec": loc_dec,
            "attn_weights_dec": attn_dec,
            "temporal_shapes": temporal_shapes,
            "level_start_index": tuple(
                int(x) for x in np.cumsum((0,) + temporal_shapes[:-1])
            ),
            "memory": memory,
            "query_features": query_features,
            "mask_flatten": enc_inputs["mask_flatten"],
            "outputs_segment_all": outputs_segment,   # (layers, B, Q, 2)
            "outputs_count_all": outputs_count,        # (layers, B, C)
        }
        if self.with_class_head:
            out["outputs_class_all"] = nn.softmax(
                self.class_embedding(query_features).astype(jnp.float32), axis=-1
            )
            out["pred_logits"] = out["outputs_class_all"][-1]
        if enc_inputs["backbone_topk_proposals"] is not None:
            out["backbone_topk_proposals"] = enc_inputs["backbone_topk_proposals"]
        if self.rho:
            out["backbone_mask_prediction"] = enc_inputs["backbone_mask_prediction"]
            out["sparse_token_nums"] = enc_inputs["sparse_token_nums"]

        if self.use_enc_aux_loss and enc_inter_feats is not None:
            counts = predict_event_num(
                self.count_head_encoder, enc_inter_feats
            ).astype(jnp.float32)
            offsets = self.segment_embedding_encoder(enc_inter_feats).astype(
                jnp.float32
            )
            coords = nn.sigmoid(enc_inter_bases[None] + offsets)  # (layers-1,B,K,2)
            out["aux_outputs_enc"] = [
                {"pred_segments": coords[i], "pred_count": counts[i]}
                for i in range(coords.shape[0])
            ]
        return out


class UnimodalDVC:
    """Functional orchestrator: proposal net + matcher + crop + captions.

    Holds flax modules and exposes pure ``init`` / ``forward_train`` /
    ``forward_eval`` functions over a params pytree
    {'proposal', 'caption', 'context_mask'?}.
    """

    def __init__(
        self,
        cfg,
        vocab_size: int,
        pad_idx: int,
        bos_idx: int,
        eos_idx: int,
        embedding_matrix: Optional[np.ndarray] = None,
    ):
        dvc = cfg.dvc
        det = dvc.detr
        anet = cfg.dataset.activity_net
        self.cfg = cfg
        self.pad_idx, self.bos_idx, self.eos_idx = pad_idx, bos_idx, eos_idx
        self.num_queries = dvc.num_queries
        self.max_gt = anet.max_gt_target_segments
        self.seq_len = anet.max_caption_len_all
        self.video_rescale_len = det.video_rescale_len
        self.num_feature_levels = det.num_feature_levels
        self.aux_loss = dvc.aux_loss
        self.use_differentiable_mask = cfg.use_differentiable_mask
        self.cost_segment = float(dvc.matcher.cost_segment)
        self.cost_giou = float(dvc.matcher.cost_giou)
        # mixed precision: master params stay f32; float leaves of params and
        # the video input are cast to this dtype inside forward_* so matmuls
        # run bf16 on the MXU, while matcher/criterion inputs are cast back to
        # f32 at the module boundary (utils/precision.py docstring)
        self.compute_dtype = resolve_dtype(cfg.compute_dtype)
        # greedy-decode backend + fused-path K/V precision (config docstring)
        self.decode_impl = str(getattr(cfg, "decode_impl", "xla"))
        self.decode_kv = str(getattr(cfg, "decode_kv", "dense"))
        self.decode_fused_grid = str(getattr(cfg, "decode_fused_grid", "video"))

        self.temporal_shapes = pyramid_shapes(
            det.video_rescale_len, det.num_feature_levels
        )
        self.num_tokens = int(sum(self.temporal_shapes))

        self.proposal_net = ProposalNet(
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
            use_enc_aux_loss=det.use_enc_aux_loss and dvc.use_sparse_detr,
            max_eseq_length=dvc.max_eseq_length,
            video_rescale_len=det.video_rescale_len,
            msda_backend=cfg.msda_backend,
            with_class_head=bool(dvc.use_deformable_detr),
            num_classes=dvc.num_classes,
        )
        cap = dvc.caption
        self.caption_decoder = UnimodalCaptionDecoder(
            vocab_size=vocab_size,
            seq_len=self.seq_len,
            d_model=cap.d_model,
            depth=cap.depth,
            num_heads=cap.num_heads,
            mlp_ratio=float(cap.mlp_ratio),
            qkv_bias=cap.qkv_bias,
            positional_embedding_dropout=cap.positional_embedding_dropout,
            attention_dropout=cap.attention_dropout,
            projection_dropout=cap.projection_dropout,
            mlp_dropout_1=cap.mlp_dropout_1,
            mlp_dropout_2=cap.mlp_dropout_2,
            pre_norm=cap.pre_norm,
            return_intermediate=cap.return_intermediate,
            pretrained_matrix=embedding_matrix,
        )
        if self.use_differentiable_mask:
            self.context_mask_model = ContextMaskModel(self.num_tokens)

    # -- init -------------------------------------------------------------------

    def init(self, rng, batch) -> Dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        params = {}
        # jit the inits: eager (op-by-op) init of the full stack takes minutes
        params["proposal"] = jax.jit(self.proposal_net.init)(
            r1, batch["video_tensor"], batch["video_mask"], batch["durations"]
        )
        B = batch["video_tensor"].shape[0]
        N = B * self.max_gt
        dummy_tokens = jnp.zeros((N, self.seq_len - 1), dtype=jnp.int32)
        dummy_memory = jnp.zeros(
            (N, self.num_tokens, self.cfg.dvc.d_model), dtype=jnp.float32
        )
        params["caption"] = jax.jit(self.caption_decoder.init)(
            r2, dummy_tokens, dummy_memory
        )
        if self.use_differentiable_mask:
            dummy_in = jnp.zeros((N, 2 + self.cfg.dvc.d_model))
            params["context_mask"] = jax.jit(self.context_mask_model.init)(
                r3, dummy_in
            )
        return params

    # -- shared trunk -------------------------------------------------------------

    def _cast_params(self, params):
        """bf16 copies of the float param leaves (f32 mode: pass-through)."""
        if self.compute_dtype == jnp.float32:
            return params
        return {k: cast_floating(v, self.compute_dtype) for k, v in params.items()}

    def _propose_and_match(self, params, batch, deterministic, rngs=None, with_aux=True):
        video = batch["video_tensor"].astype(self.compute_dtype)
        out = self.proposal_net.apply(
            params["proposal"],
            video, batch["video_mask"], batch["durations"],
            deterministic,
            rngs=rngs,
        )
        if self.compute_dtype != jnp.float32:
            # matcher/criterion consume f32; only the caption-decoder inputs
            # (the shared memory and the query features feeding the context
            # mask) stay in compute dtype
            keep = ("memory", "query_features")
            out = {
                k: (v if k in keep else cast_floating(v, jnp.float32))
                for k, v in out.items()
            }
        gt_segments = batch["gt_segments"]  # (B, G, 2)
        gt_mask = batch["gt_mask"]          # (B, G)
        indices = hungarian_match(
            out["pred_segments"], gt_segments, gt_mask,
            self.cost_segment, self.cost_giou,
        )  # (B, G)

        indices_aux = None
        if self.aux_loss and with_aux:
            aux_seg = out["outputs_segment_all"][:-1]  # (layers-1, B, Q, 2)
            Lm1, B = aux_seg.shape[0], aux_seg.shape[1]
            flat = aux_seg.reshape(Lm1 * B, self.num_queries, 2)
            gt_rep = jnp.tile(gt_segments, (Lm1, 1, 1))
            mask_rep = jnp.tile(gt_mask, (Lm1, 1))
            indices_aux = hungarian_match(
                flat, gt_rep, mask_rep, self.cost_segment, self.cost_giou
            ).reshape(Lm1, B, self.max_gt)
        return out, indices, indices_aux

    def _prepare_caption_inputs(self, params, out, batch, indices):
        """Per-event crop mask + optional differentiable context mask.

        The reference materializes a per-event copy of the memory zeroed
        outside the event (unimodal_sparse_dvc.py:480-516); here only the
        crop MASK is built and the caption decoder cross-attends the shared
        per-video memory with groups=G (bit-identical attention output —
        masked positions never contribute — at ~G× less K/V HBM traffic).

        Returns (memory (B,S,D) shared, crop_pad_mask (N,S),
                 caption_pad_mask (N,S) actually used by cross-attn,
                 pred_memory_mask logits (N,S) or None)."""
        B, G = indices.shape
        rows = jnp.arange(B)[:, None]
        matched_segments = out["pred_segments"][rows, indices]  # (B, G, 2)
        denorm = denormalize_segments(
            matched_segments, batch["durations"][:, None]
        )  # (B, G, 2) seconds

        crop_mask = crop_segment_mask(
            denorm, batch["durations"],
            self.video_rescale_len, self.num_feature_levels,
            num_tokens=out["memory"].shape[1],
        )  # (B, G, S) True=outside
        N = B * G
        S = crop_mask.shape[2]
        memory = out["memory"]  # (B, S, D) shared across the G events
        crop_mask = crop_mask.reshape(N, S)

        pred_memory_mask = None
        caption_pad_mask = crop_mask
        if self.use_differentiable_mask:
            qf = out["query_features"][-1]  # (B, Q, D)
            qf_sel = qf[rows, indices].reshape(N, -1)  # (N, D)
            cm_in = jnp.concatenate([denorm.reshape(N, 2), qf_sel], axis=1)
            pred_memory_mask = self.context_mask_model.apply(
                params["context_mask"], cm_in
            )  # (N, S) logits
            # confidence gating is identity in the reference (:258-260)
            caption_pad_mask = nn.sigmoid(pred_memory_mask) > 0.5
        return memory, crop_mask, caption_pad_mask, pred_memory_mask

    # -- public forwards -----------------------------------------------------------

    def forward_train(self, params, batch, dropout_rng) -> Tuple[Dict, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Returns (out, indices, indices_aux, memory_mask_float) mirroring the
        reference forward's return contract (minus the argmaxed captions)."""
        params = self._cast_params(params)
        rngs = {"dropout": dropout_rng}
        out, indices, indices_aux = self._propose_and_match(
            params, batch, deterministic=False, rngs=rngs
        )
        memory, crop_mask, caption_pad_mask, pred_memory_mask = (
            self._prepare_caption_inputs(params, out, batch, indices)
        )
        if pred_memory_mask is not None:
            out["pred_memory_mask"] = pred_memory_mask

        cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)  # (N, Lc)
        tgt = cap_tokens[:, :-1]
        tgt_padding_mask = tgt == self.pad_idx
        tgt_mask = make_causal_mask(self.seq_len - 1)
        # the crop mask doubles as the zeroed-input map when the differentiable
        # context mask can unmask tokens outside the crop (bias-column path)
        zeroed = crop_mask if self.use_differentiable_mask else None
        outputs_caption = self.caption_decoder.apply(
            params["caption"], tgt, memory,
            tgt_mask, tgt_padding_mask, caption_pad_mask,
            deterministic=False, groups=self.max_gt, zeroed_mask=zeroed,
            return_logits=True, rngs=rngs,
        )  # (depth, N, Lc-1, V) raw logits — fused-loss train path; the
        # criterion folds the log_softmax into the KL reductions so no
        # V-sized log-prob tensor is stored for backward (see criterion.py)
        out["pred_captions"] = outputs_caption[-1]
        out["caption_head"] = "logits"
        if self.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_segments": out["outputs_segment_all"][i],
                    "pred_count": out["outputs_count_all"][i],
                }
                for i in range(out["outputs_segment_all"].shape[0] - 1)
            ]
            # full logits stack: criterion computes final + aux caption
            # losses vectorized over depth (one backward kernel, no
            # per-depth grad broadcasts back into the stack)
            out["pred_captions_all"] = outputs_caption
        memory_mask_float = crop_mask.astype(jnp.float32)
        return out, indices, indices_aux, memory_mask_float

    def forward_eval(
        self,
        params,
        batch,
        val_mode: str = "one_by_one",
        faster_eval: bool = False,
        beam_size: int = 0,
        length_penalty: float = 0.0,
    ):
        """Returns (out, captions_with_eos (N, Lc[+1]), indices, indices_aux,
        memory_mask_float).

        val_mode: 'one_by_one' (greedy; reference unimodal_sparse_dvc.py:111),
        'teacher_forcing', 'beam' (beam-search decode, beyond the reference),
        or 'serve' (greedy, no loss bookkeeping).
        faster_eval: reference's raw-argmax greedy variant
        (unimodal_sparse_dvc.py:334-351), applies to one_by_one/serve.
        """
        params = self._cast_params(params)
        out, indices, indices_aux = self._propose_and_match(
            params, batch, deterministic=True, with_aux=(val_mode != "serve")
        )
        memory, crop_mask, caption_pad_mask, pred_memory_mask = (
            self._prepare_caption_inputs(params, out, batch, indices)
        )
        if pred_memory_mask is not None:
            out["pred_memory_mask"] = pred_memory_mask
        G = self.max_gt
        zeroed = crop_mask if self.use_differentiable_mask else None

        if val_mode in ("one_by_one", "serve", "beam"):
            kv_dtype = (
                jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
            )
            if val_mode == "beam":
                captions_with_eos = beam_search_decode(
                    self.caption_decoder, params["caption"],
                    memory, caption_pad_mask,
                    self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                    beam_size=beam_size or 4, length_penalty=length_penalty,
                    groups=G, zeroed_mask=zeroed,
                )
            else:
                captions_with_eos = greedy_decode(
                    self.caption_decoder, params["caption"],
                    memory, caption_pad_mask,
                    self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                    faster_eval=faster_eval, kv_dtype=kv_dtype, groups=G,
                    zeroed_mask=zeroed,
                    decode_impl=self.decode_impl, kv_mode=self.decode_kv,
                    fused_grid=self.decode_fused_grid,
                )
            if val_mode == "serve":
                # pure inference: skip the loss-only teacher-forced pass and
                # aux bookkeeping entirely (serving configuration)
                return out, captions_with_eos, indices, indices_aux, crop_mask.astype(jnp.float32)
            # losses still need teacher-forced predictions (engine.py:219)
            cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
            tgt = cap_tokens[:, :-1]
            outputs_caption = self.caption_decoder.apply(
                params["caption"], tgt, memory,
                make_causal_mask(self.seq_len - 1), tgt == self.pad_idx,
                caption_pad_mask, groups=G, zeroed_mask=zeroed,
            )
        elif val_mode == "teacher_forcing":
            cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
            tgt = cap_tokens[:, :-1]
            outputs_caption = self.caption_decoder.apply(
                params["caption"], tgt, memory,
                make_causal_mask(self.seq_len - 1), tgt == self.pad_idx,
                caption_pad_mask, groups=G, zeroed_mask=zeroed,
            )
            captions_with_eos = jnp.argmax(outputs_caption[-1], axis=-1)
        else:
            raise ValueError(f"bad val_mode {val_mode!r}")

        out["pred_captions"] = outputs_caption[-1]
        if self.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_segments": out["outputs_segment_all"][i],
                    "pred_count": out["outputs_count_all"][i],
                }
                for i in range(out["outputs_segment_all"].shape[0] - 1)
            ]
            out["aux_outputs_caption"] = [
                {"pred_captions": outputs_caption[i]}
                for i in range(outputs_caption.shape[0] - 1)
            ]
        return out, captions_with_eos, indices, indices_aux, crop_mask.astype(jnp.float32)

    def forward_serve(
        self,
        params,
        video_tensor,
        video_mask,
        durations,
        faster_eval: bool = False,
        rank: str = "stability",
    ):
        """GT-free serving forward: propose → select top-G proposals WITHOUT
        ground truth → caption. Beyond the reference, whose only inference
        entry (inference.py:112-121) Hungarian-matches predictions against GT
        annotations before captioning; a deployed system has no GT.

        Selection: k* = argmax of the (trained) count head, clamped to
        [1, G]; proposals ranked by
          * 'stability' (default): negative mean drift of each query's
            segment across decoder refinement layers — queries whose
            segments have converged rank first. Works for every family.
          * 'class': foreground probability 1 - p(no-object) when the class
            head exists. NOTE: the class-CE term is commented out in the
            reference criterion (criterion.py:90-93), so this head is
            untrained in both systems; provided for parity with the PDVC
            protocol only.

        Returns a dict with segments (B, G, 2) seconds, captions
        (B, G, Lc+1) token ids incl. BOS, k (B,) predicted event counts,
        scores (B, G) selection scores, valid (B, G) bool (row < k*).
        """
        params, prep = self._serve_prepare(
            params, video_tensor, video_mask, durations, rank)
        captions = greedy_decode(
            self.caption_decoder, params["caption"],
            prep["memory"], prep["caption_pad_mask"],
            self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
            faster_eval=faster_eval, kv_dtype=prep["kv_dtype"],
            groups=self.max_gt, zeroed_mask=prep["zeroed"],
            decode_impl=self.decode_impl, kv_mode=self.decode_kv,
            fused_grid=self.decode_fused_grid,
        )  # (B*G, Lc+1)
        B = durations.shape[0]
        return {
            "segments": prep["segments"],
            "captions": captions.reshape(B, self.max_gt, -1),
            "k": prep["k"],
            "scores": prep["scores"],
            "valid": prep["valid"],
        }

    def _serve_prepare(self, params, video_tensor, video_mask, durations,
                       rank: str):
        """Shared GT-free serving front half: propose, rank, select top-G,
        crop per-event memory. Returns (cast params, dict of decode inputs +
        resolved proposal outputs)."""
        params = self._cast_params(params)
        out = self.proposal_net.apply(
            params["proposal"],
            video_tensor.astype(self.compute_dtype),
            video_mask, durations, True,
        )
        if self.compute_dtype != jnp.float32:
            keep = ("memory", "query_features")
            out = {
                k: (v if k in keep else cast_floating(v, jnp.float32))
                for k, v in out.items()
            }
        G = self.max_gt
        if rank == "class" and "pred_logits" in out:
            scores = 1.0 - out["pred_logits"][..., -1]  # (B, Q) foreground
        else:
            seg_all = out["outputs_segment_all"]  # (layers, B, Q, 2)
            if seg_all.shape[0] < 2:
                # a single decoder layer has no refinement drift to rank by:
                # jnp.mean over the empty diff axis would yield NaN scores
                # and an arbitrary top_k; fall back to uniform scores
                scores = jnp.zeros(seg_all.shape[1:3], seg_all.dtype)
            else:
                scores = -jnp.mean(
                    jnp.abs(seg_all[1:] - seg_all[:-1]), axis=(0, 3)
                )  # (B, Q)
        top_scores, indices = jax.lax.top_k(scores, G)  # (B, G) each

        k = jnp.argmax(out["pred_count"], axis=-1)  # (B,)
        k = jnp.clip(k, 1, G)
        valid = jnp.arange(G)[None, :] < k[:, None]  # (B, G)

        memory, crop_mask, caption_pad_mask, _ = self._prepare_caption_inputs(
            params, out, {"durations": durations}, indices
        )
        zeroed = crop_mask if self.use_differentiable_mask else None
        kv_dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
        )
        B = indices.shape[0]
        rows = jnp.arange(B)[:, None]
        segments = denormalize_segments(
            out["pred_segments"][rows, indices], durations[:, None]
        )  # (B, G, 2) seconds
        return params, {
            "memory": memory,
            "caption_pad_mask": caption_pad_mask,
            "zeroed": zeroed,
            "kv_dtype": kv_dtype,
            "segments": segments,
            "k": k,
            "scores": top_scores,
            "valid": valid,
        }

    # -- continuous-batching serve pieces (serve.py --continuous) ----------

    def forward_serve_prefill(self, params, video_tensor, video_mask,
                              durations, rank: str = "stability"):
        """Front half of forward_serve for the continuous-batching server:
        propose + select + crop memory, precompute per-layer cross-attn K/V,
        and initialize the per-slot decode state. The decode then advances in
        chunks (`forward_serve_decode_chunk`) so finished slots are harvested
        and refilled mid-flight instead of holding the batch through the
        longest caption.

        Returns (ctx, state):
          ctx   — per-slot decode context + resolved proposal outputs
                  (mem_kv, caption_pad_mask, zeroed, segments, k, scores);
          state — mutable decode state (captions (N, L), done (N,),
                  t (B,), k_caches, v_caches).
        """
        params, prep = self._serve_prepare(
            params, video_tensor, video_mask, durations, rank)
        G = self.max_gt
        B = durations.shape[0]
        N = B * G
        memory = prep["memory"]
        mem_kv = self.caption_decoder.apply(
            params["caption"], memory,
            method=UnimodalCaptionDecoder.precompute_memory_kv)
        if prep["kv_dtype"] is not None:
            mem_kv = jax.tree.map(
                lambda a: a.astype(prep["kv_dtype"]), mem_kv)
        D = memory.shape[-1]
        depth = self.caption_decoder.depth
        captions = jnp.full((N, self.seq_len), self.pad_idx, dtype=jnp.int32)
        captions = captions.at[:, 0].set(self.bos_idx)
        ctx = {
            "mem_kv": mem_kv,
            "caption_pad_mask": prep["caption_pad_mask"],
            "zeroed": prep["zeroed"],
            "segments": prep["segments"],
            "k": prep["k"],
            "scores": prep["scores"],
            "valid": prep["valid"],
        }
        state = {
            "captions": captions,
            "done": jnp.zeros((N,), dtype=bool),
            "t": jnp.ones((B,), dtype=jnp.int32),
            "k_caches": jnp.zeros((depth, N, self.seq_len, D), memory.dtype),
            "v_caches": jnp.zeros((depth, N, self.seq_len, D), memory.dtype),
        }
        return ctx, state

    def forward_serve_decode_chunk(self, params, ctx, state,
                                   active_vid, chunk: int):
        """Advance every active slot's greedy decode by up to `chunk` tokens
        at per-slot cursors (caption_decoder.greedy_decode_chunk)."""
        params = self._cast_params(params)
        captions, done, t, kc, vc = greedy_decode_chunk(
            self.caption_decoder, params["caption"],
            state["captions"], state["done"], state["t"],
            state["k_caches"], state["v_caches"],
            ctx["mem_kv"], ctx["caption_pad_mask"],
            self.seq_len, self.eos_idx, self.pad_idx,
            self.max_gt, ctx["zeroed"], active_vid, chunk,
        )
        return {"captions": captions, "done": done, "t": t,
                "k_caches": kc, "v_caches": vc}

    @staticmethod
    def merge_serve_slots(ctx, state, new_ctx, new_state, replace, groups):
        """Swap freshly prefilled slots into the running decode state where
        `replace` (B,) is True — pure jnp.where per leaf (leading dim B,
        N = B*groups, or (depth, N, ...) for the caches)."""
        B = replace.shape[0]
        rrow = jnp.repeat(replace, groups)

        def mb(o, n):  # leading dim B
            return jnp.where(replace.reshape((B,) + (1,) * (o.ndim - 1)), n, o)

        def mrow(o, n):  # leading dim N
            m = rrow.reshape((rrow.shape[0],) + (1,) * (o.ndim - 1))
            return jnp.where(m, n, o)

        def mcache(o, n):  # (depth, N, ...)
            m = rrow.reshape((1, rrow.shape[0]) + (1,) * (o.ndim - 2))
            return jnp.where(m, n, o)

        merged_ctx = {
            "mem_kv": jax.tree.map(mb, ctx["mem_kv"], new_ctx["mem_kv"]),
            "caption_pad_mask": mrow(ctx["caption_pad_mask"],
                                     new_ctx["caption_pad_mask"]),
            "zeroed": (None if ctx["zeroed"] is None
                       else mrow(ctx["zeroed"], new_ctx["zeroed"])),
            "segments": mb(ctx["segments"], new_ctx["segments"]),
            "k": mb(ctx["k"], new_ctx["k"]),
            "scores": mb(ctx["scores"], new_ctx["scores"]),
            "valid": mb(ctx["valid"], new_ctx["valid"]),
        }
        merged_state = {
            "captions": mrow(state["captions"], new_state["captions"]),
            "done": mrow(state["done"], new_state["done"]),
            "t": mb(state["t"], new_state["t"]),
            "k_caches": mcache(state["k_caches"], new_state["k_caches"]),
            "v_caches": mcache(state["v_caches"], new_state["v_caches"]),
        }
        return merged_ctx, merged_state


def build_model(cfg, vocab_size, pad_idx=1, bos_idx=2, eos_idx=3, embedding_matrix=None):
    return UnimodalDVC(cfg, vocab_size, pad_idx, bos_idx, eos_idx, embedding_matrix)
