"""Regular (non-deformable) DVC family: vanilla cross-attention decoder
straight over frame features, optionally fed by the ViViT/AST backbones.

Behavioral spec: reference ``models/regular/dvc.py:26-443`` +
``models/regular/decoder.py:10-111`` — query embedding, a stack of vanilla
(self-attn + cross-attn + MLP) decoder layers over single-scale frame
features, class/segment/count heads, then the same matcher -> crop -> caption
flow as the other families.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment_ops import denormalize_segments
from .backbones import VideoVisionTransformer
from .caption_decoder import UnimodalCaptionDecoder, greedy_decode, make_causal_mask
from .dvc import crop_segments
from .layers import ContextMaskModel, CrossAttention, FFN, MLP
from .matcher import hungarian_match
from .transformer import predict_event_num


class RegularDecoderLayer(nn.Module):
    """Vanilla decoder block: self-attn over queries, cross-attn into frame
    memory, MLP (post-norm). Reference models/modules/layers.py:390-504."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0

    def setup(self):
        self.self_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.cross_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.drop1 = nn.Dropout(self.projection_dropout)
        self.drop2 = nn.Dropout(self.projection_dropout)
        self.norm1 = nn.LayerNorm(epsilon=1e-6)
        self.norm2 = nn.LayerNorm(epsilon=1e-6)
        self.norm3 = nn.LayerNorm(epsilon=1e-6)
        self.mlp = MLP(int(self.d_model * self.mlp_ratio), self.d_model)

    def __call__(self, tgt, memory, memory_padding_mask=None, deterministic=True):
        sa = self.self_attention(tgt, tgt, tgt, deterministic=deterministic)
        x = self.norm1(tgt + self.drop1(sa, deterministic=deterministic))
        ca = self.cross_attention(
            x, memory, memory, key_padding_mask=memory_padding_mask,
            deterministic=deterministic,
        )
        x = self.norm2(x + self.drop2(ca, deterministic=deterministic))
        x = self.norm3(x + self.mlp(x, deterministic=deterministic))
        return x


class RegularProposalNet(nn.Module):
    d_model: int = 512
    num_queries: int = 20
    depth: int = 6
    num_heads: int = 8
    max_eseq_length: int = 10
    num_classes: int = 200
    dropout: float = 0.1
    use_vivit: bool = False
    vivit_mode: str = "factorised encoder"
    vivit_depth: int = 4
    vivit_temporal_depth: int = 2

    def setup(self):
        if self.use_vivit:
            self.backbone = VideoVisionTransformer(
                model_name=self.vivit_mode, d_model=self.d_model,
                depth=self.vivit_depth, temporal_depth=self.vivit_temporal_depth,
                num_heads=self.num_heads,
            )
        self.input_proj = nn.Dense(self.d_model)
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model),
        )
        self.decoder = [
            RegularDecoderLayer(
                self.d_model, self.num_heads, attention_dropout=self.dropout,
                projection_dropout=self.dropout,
            )
            for _ in range(self.depth)
        ]
        self.class_embedding = nn.Dense(self.num_classes + 1)
        self.segment_embedding = FFN(self.d_model, 2, 3, final_zero_init=True)
        self.count_head = nn.Dense(self.max_eseq_length + 1)

    def __call__(self, video, video_mask, durations, deterministic: bool = True):
        """video: (B, T, Dv) precomputed features OR (B, T, H, W, C) raw frames
        when use_vivit. Returns the `out` dict for the shared orchestration."""
        if self.use_vivit:
            if video.dtype == jnp.uint8:
                # raw frames: jitted ImageNet normalization fuses into the
                # backbone's first conv (data/video_transforms.py)
                from ..data.video_transforms import normalize

                video = normalize(video)
            memory = self.backbone(video, deterministic)
        else:
            memory = video
        memory = self.input_proj(memory)  # (B, T, D)

        B = memory.shape[0]
        tgt = jnp.broadcast_to(
            self.query_embedding[None], (B,) + self.query_embedding.shape
        )
        inter = []
        for layer in self.decoder:
            tgt = layer(tgt, memory, video_mask, deterministic)
            inter.append(tgt)
        query_features = jnp.stack(inter)  # (depth, B, Q, D)

        outputs_class = nn.softmax(self.class_embedding(query_features), axis=-1)
        outputs_segment = nn.sigmoid(self.segment_embedding(query_features))
        outputs_count = predict_event_num(self.count_head, query_features)

        return {
            "pred_logits": outputs_class[-1],
            "pred_segments": outputs_segment[-1],
            "pred_count": outputs_count[-1],
            "outputs_segment_all": outputs_segment,
            "outputs_count_all": outputs_count,
            "memory": memory,
            "query_features": query_features,
        }


class RegularDVC:
    """Orchestrator for the regular family (same contract as UnimodalDVC)."""

    def __init__(self, cfg, vocab_size, pad_idx=1, bos_idx=2, eos_idx=3,
                 embedding_matrix: Optional[np.ndarray] = None):
        dvc = cfg.dvc
        anet = cfg.dataset.activity_net
        self.cfg = cfg
        self.pad_idx, self.bos_idx, self.eos_idx = pad_idx, bos_idx, eos_idx
        self.max_gt = anet.max_gt_target_segments
        self.seq_len = anet.max_caption_len_all
        self.video_rescale_len = anet.video_rescale_len
        self.aux_loss = dvc.aux_loss
        self.use_differentiable_mask = cfg.use_differentiable_mask
        self.cost_segment = float(dvc.matcher.cost_segment)
        self.cost_giou = float(dvc.matcher.cost_giou)
        self.num_queries = dvc.num_queries
        self.num_tokens = anet.video_rescale_len

        self.proposal_net = RegularProposalNet(
            d_model=dvc.d_model,
            num_queries=dvc.num_queries,
            depth=cfg.dvc.decoder.depth if "decoder" in cfg.dvc else 6,
            num_heads=dvc.detr.num_heads,
            max_eseq_length=dvc.max_eseq_length,
            num_classes=dvc.num_classes,
            use_vivit=bool(cfg.use_raw_videos),
        )
        cap = dvc.caption
        self.caption_decoder = UnimodalCaptionDecoder(
            vocab_size=vocab_size, seq_len=self.seq_len, d_model=cap.d_model,
            depth=cap.depth, num_heads=cap.num_heads,
            mlp_ratio=float(cap.mlp_ratio), qkv_bias=cap.qkv_bias,
            pre_norm=cap.pre_norm, return_intermediate=cap.return_intermediate,
            pretrained_matrix=embedding_matrix,
        )
        if self.use_differentiable_mask:
            self.context_mask_model = ContextMaskModel(self.num_tokens)

    def init(self, rng, batch) -> Dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        params = {}
        params["proposal"] = jax.jit(self.proposal_net.init)(
            r1, batch["video_tensor"], batch["video_mask"], batch["durations"]
        )
        B = batch["video_tensor"].shape[0]
        N = B * self.max_gt
        tok = jnp.zeros((N, self.seq_len - 1), dtype=jnp.int32)
        mem = jnp.zeros((N, self.num_tokens, self.cfg.dvc.d_model))
        params["caption"] = jax.jit(self.caption_decoder.init)(r2, tok, mem)
        if self.use_differentiable_mask:
            dummy = jnp.zeros((N, 2 + self.cfg.dvc.d_model))
            params["context_mask"] = jax.jit(self.context_mask_model.init)(r3, dummy)
        return params

    def _common(self, params, batch, deterministic, rngs=None):
        out = self.proposal_net.apply(
            params["proposal"], batch["video_tensor"], batch["video_mask"],
            batch["durations"], deterministic, rngs=rngs,
        )
        indices = hungarian_match(
            out["pred_segments"], batch["gt_segments"], batch["gt_mask"],
            self.cost_segment, self.cost_giou,
        )
        indices_aux = None
        if self.aux_loss:
            aux_seg = out["outputs_segment_all"][:-1]
            Lm1, B = aux_seg.shape[0], aux_seg.shape[1]
            indices_aux = hungarian_match(
                aux_seg.reshape(Lm1 * B, self.num_queries, 2),
                jnp.tile(batch["gt_segments"], (Lm1, 1, 1)),
                jnp.tile(batch["gt_mask"], (Lm1, 1)),
                self.cost_segment, self.cost_giou,
            ).reshape(Lm1, B, self.max_gt)

        B, G = indices.shape
        rows = jnp.arange(B)[:, None]
        matched = out["pred_segments"][rows, indices]
        denorm = denormalize_segments(matched, batch["durations"][:, None])
        mem_crop, crop_mask = crop_segments(
            out["memory"], denorm, batch["durations"], self.video_rescale_len, 1
        )
        N = B * G
        mem_crop = mem_crop.reshape(N, -1, mem_crop.shape[-1])
        crop_mask = crop_mask.reshape(N, -1)

        pred_mask = None
        cap_mask = crop_mask
        if self.use_differentiable_mask:
            qf = out["query_features"][-1][rows, indices].reshape(N, -1)
            cm_in = jnp.concatenate([denorm.reshape(N, 2), qf], axis=1)
            pred_mask = self.context_mask_model.apply(params["context_mask"], cm_in)
            out["pred_memory_mask"] = pred_mask
            cap_mask = nn.sigmoid(pred_mask) > 0.5
        return out, indices, indices_aux, mem_crop, crop_mask, cap_mask

    def _finish(self, out, outputs_caption, caption_head=None):
        # "caption_head" marker is train-only (string leaves are invalid jit
        # outputs; eval `out` dicts cross jit boundaries in tests/tools).
        # Train also ships the full logits stack for the criterion's
        # depth-vectorized caption losses (see criterion.py).
        out["pred_captions"] = outputs_caption[-1]
        if caption_head:
            out["caption_head"] = caption_head
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_segments": out["outputs_segment_all"][i],
                 "pred_count": out["outputs_count_all"][i]}
                for i in range(out["outputs_segment_all"].shape[0] - 1)
            ]
            if caption_head == "logits":
                out["pred_captions_all"] = outputs_caption
            else:
                out["aux_outputs_caption"] = [
                    {"pred_captions": outputs_caption[i]}
                    for i in range(outputs_caption.shape[0] - 1)
                ]
        return out

    def forward_train(self, params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng}
        out, indices, indices_aux, mem, crop_mask, cap_mask = self._common(
            params, batch, False, rngs
        )
        cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
        tgt = cap_tokens[:, :-1]
        outputs_caption = self.caption_decoder.apply(
            params["caption"], tgt, mem, make_causal_mask(self.seq_len - 1),
            tgt == self.pad_idx, cap_mask, deterministic=False,
            return_logits=True, rngs=rngs,
        )  # raw compute-dtype logits — fused-loss train path (see criterion.py)
        out = self._finish(out, outputs_caption, caption_head="logits")
        return out, indices, indices_aux, crop_mask.astype(jnp.float32)

    def forward_eval(
        self,
        params,
        batch,
        val_mode: str = "one_by_one",
        faster_eval: bool = False,
        beam_size: int = 0,
        length_penalty: float = 0.0,
    ):
        out, indices, indices_aux, mem, crop_mask, cap_mask = self._common(
            params, batch, True
        )
        cap_tokens = batch["cap_tokens"].reshape(-1, self.seq_len)
        tgt = cap_tokens[:, :-1]
        outputs_caption = self.caption_decoder.apply(
            params["caption"], tgt, mem, make_causal_mask(self.seq_len - 1),
            tgt == self.pad_idx, cap_mask,
        )
        if val_mode == "beam":
            from .caption_decoder import beam_search_decode

            captions_with_eos = beam_search_decode(
                self.caption_decoder, params["caption"], mem, cap_mask,
                self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                beam_size=beam_size or 4, length_penalty=length_penalty,
            )
        elif val_mode == "one_by_one":
            captions_with_eos = greedy_decode(
                self.caption_decoder, params["caption"], mem, cap_mask,
                self.seq_len, self.bos_idx, self.eos_idx, self.pad_idx,
                faster_eval=faster_eval,
            )
        else:
            captions_with_eos = jnp.argmax(outputs_caption[-1], axis=-1)
        out = self._finish(out, outputs_caption)
        return out, captions_with_eos, indices, indices_aux, crop_mask.astype(jnp.float32)


def build_regular_model(cfg, vocab_size, pad_idx=1, bos_idx=2, eos_idx=3, embedding_matrix=None):
    return RegularDVC(cfg, vocab_size, pad_idx, bos_idx, eos_idx, embedding_matrix)
