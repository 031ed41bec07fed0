"""Set criterion: all DVC losses over fixed-shape padded batches, inside jit.

Behavioral spec: reference ``models/criterion.py`` —
  * 'labels'  -> event-count cross-entropy with a Gaussian neighborhood mask
                (:129-139, :581-601; the per-class CE variants are dead code).
  * 'segments'-> L1 + gIoU over Hungarian-matched pairs (:185-243).
  * 'captions'-> label-smoothed KL on caption probabilities (:312-335,
                :545-575; smoothing mass sm/(V-2), pad prob zeroed, pad-target
                rows dropped, normalized by the global non-pad token count).
  * 'contexts'-> BCE-with-logits on the predicted memory mask (:338-360).
  * 'mask_prediction' -> multilabel soft margin vs the top-k of the decoder
                attention splat (:246-280).
  * 'corr'    -> no-grad coverage diagnostic (:283-309).

Distributed note: the reference all_reduces the num_segments / num_tokens
normalizers across DDP ranks (:478-490).  Here the criterion runs inside a
jitted step over the *global* (mesh-sharded) batch, so plain ``jnp.sum`` over
the batch axis already is the global reduction — XLA inserts the collectives.

Shape note: dynamic "nb_target_segments" becomes the fixed (B, G=max_gt) grid
with ``gt_mask`` validity; all reductions are mask-weighted, matching the
reference's dynamic sums exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.dam import attn_map_to_flat_grid
from ..ops.segment_ops import generalized_box_iou, segment_cl_to_xy

# Event-count prior rates over ActivityNet train (reference criterion.py:61-68);
# a dataset statistics table, required to reproduce the counter loss weighting.
COUNTER_CLASS_RATE = [
    0.00000000e00, 0.00000000e00, 1.93425917e-01, 4.12129084e-01,
    1.88929963e-01, 7.81296833e-02, 5.09541413e-02, 3.12718553e-02,
    1.84833650e-02, 8.39244680e-03, 6.59406534e-03, 4.49595364e-03,
    2.19802178e-03, 1.79838146e-03, 5.99460486e-04, 4.99550405e-04,
    4.99550405e-04, 1.99820162e-04, 2.99730243e-04, 3.99640324e-04,
    2.99730243e-04, 0.00000000e00, 1.99820162e-04, 0.00000000e00,
    0.00000000e00, 0.00000000e00, 9.99100809e-05, 9.99100809e-05,
]


def _bce_with_logits(x, y, weight=None):
    """Elementwise binary cross-entropy with logits (torch semantics)."""
    loss = jnp.clip(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weight is not None:
        loss = loss * weight
    return loss


def _masked_row_mean(per_row: jnp.ndarray, row_valid) -> jnp.ndarray:
    """Mean over the batch axis restricted to valid rows (None = all valid).

    The reference never pads the batch dimension, so batch-padded steps must
    produce losses identical to the unpadded batch."""
    if row_valid is None:
        return per_row.mean()
    n = jnp.clip(jnp.sum(row_valid).astype(per_row.dtype), 1.0)
    return jnp.sum(jnp.where(row_valid, per_row, 0.0)) / n


def cross_entropy_with_gaussian_mask(
    inputs, targets, weight, lloss_gau_mask: int = 1, lloss_beta: float = 1.0,
    row_valid=None,
):
    """Counter loss; reference criterion.py:581-601."""
    max_seq_len = targets.shape[1]
    mu = jnp.arange(max_seq_len, dtype=jnp.float32)
    # mask_dict[i, j] = exp(-(i - j)^2 / (2 * sigma^2)), sigma = 2
    mask_dict = jnp.exp(-((mu[:, None] - mu[None, :]) ** 2) / 8.0)
    ind = jnp.argmax(targets, axis=1)
    mask = mask_dict[ind]  # (B, C)

    loss = _bce_with_logits(inputs, targets, weight=1.0 - weight)
    if lloss_gau_mask:
        coef = targets + ((1.0 - mask) ** lloss_beta) * (1.0 - targets)
    else:
        coef = jnp.ones_like(targets)
    return _masked_row_mean((loss * coef).mean(axis=1), row_valid)


def label_smoothing_kl(
    log_pred: jnp.ndarray,  # (N, S, V) log-probabilities
    target: jnp.ndarray,    # (N, S) int token ids
    pad_idx: int,
    smoothing: float,
) -> jnp.ndarray:
    """Sum-reduced KL(dist || pred) with the reference's smoothing scheme
    (criterion.py:545-575), computed in closed form (no V-sized scatter):
    dist = sm/(V-2) everywhere, 1-sm at the target, 0 at <pad>, and rows whose
    target is <pad> contribute nothing."""
    V = log_pred.shape[-1]
    sm = smoothing
    u = sm / (V - 2)

    lp_sum = log_pred.sum(-1)  # (N, S)
    lp_tgt = jnp.take_along_axis(log_pred, target[..., None], axis=-1)[..., 0]
    lp_pad = log_pred[..., pad_idx]

    # cross term sum_v dist * log_pred
    cross = u * (lp_sum - lp_pad - lp_tgt) + (1.0 - sm) * lp_tgt
    # entropy term sum_v dist * log(dist): (V-2) cells of u plus the target cell
    ent = (V - 2) * u * jnp.log(u) + (1.0 - sm) * jnp.log(1.0 - sm)

    valid = target != pad_idx
    return jnp.sum(jnp.where(valid, ent - cross, 0.0))


def _ls_kl_pointwise_from_logits(logits, target_b, pad_idx, smoothing):
    """Masked per-position (ent - cross) of the smoothing KL, straight from
    raw logits of ANY float dtype (bf16 logits are upcast inside the fusion).

    Byte-traffic rationale (the train step is HBM-bound, see PERF.md): feeding
    ``log_softmax(logits)`` into the loss makes autodiff *store* the (…, V)
    log-prob tensor for the log_softmax VJP — at production shapes a ~560 MB
    f32 write + re-read per step on top of the logits themselves.  Here the
    cross term is ONE weighted reduction ``sum_v c_v * logits_v`` with the
    per-vocab coefficient built from an iota compare (no gather, no pad-slice
    — each of those cost a further full-stack read in the HLO byte profile),
    plus the two logsumexp passes; the upcast to f32 is elementwise and fuses
    into the reductions, so the only V-sized residual is the (bf16) logits the
    vocab head materializes anyway.  The backward is one fused elementwise
    kernel: d/d logits = (Σc)·softmax − c on valid positions.

    ``target_b``: integer targets broadcastable to ``logits.shape[:-1]``.
    Positions with target == pad contribute 0 (their coefficient column is
    junk there — pad and target coincide — but they are masked out).
    Equivalence with the log-prob path (value AND grad) is pinned by
    tests/test_criterion_parity.py.
    """
    V = logits.shape[-1]
    sm = smoothing
    u = sm / (V - 2)

    x = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x, axis=-1)  # (...,)
    ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    is_tgt = (ids == target_b[..., None]).astype(jnp.float32)
    is_pad = (ids == pad_idx).astype(jnp.float32)
    # c_v = u everywhere, 1-sm at the target, 0 at <pad>
    c = u + is_tgt * ((1.0 - sm) - u) - is_pad * u
    wsum = jnp.sum(x * c, axis=-1)
    # sum_v c_v = u*(V-2) + (1-sm) when target != pad (the only rows kept)
    cross = wsum - (u * (V - 2) + (1.0 - sm)) * lse
    ent = (V - 2) * u * jnp.log(u) + (1.0 - sm) * jnp.log(1.0 - sm)

    valid = target_b != pad_idx
    return jnp.where(valid, ent - cross, 0.0)


def label_smoothing_kl_logits(
    logits: jnp.ndarray,    # (N, S, V) raw logits (pre log_softmax; any float dtype)
    target: jnp.ndarray,    # (N, S) int token ids
    pad_idx: int,
    smoothing: float,
) -> jnp.ndarray:
    """Same loss as :func:`label_smoothing_kl` computed from raw logits —
    log_softmax folded into closed-form reductions, single weighted-reduce
    cross term (see :func:`_ls_kl_pointwise_from_logits` for the byte math).
    """
    return jnp.sum(_ls_kl_pointwise_from_logits(logits, target, pad_idx, smoothing))


def label_smoothing_kl_logits_stack(
    stack: jnp.ndarray,     # (D, N, S, V) raw logits for all decoder depths
    target: jnp.ndarray,    # (N, S) int token ids (shared across depths)
    pad_idx: int,
    smoothing: float,
) -> jnp.ndarray:
    """Per-depth caption losses computed over the WHOLE intermediate stack in
    one pass -> (D,).

    Equivalent to calling :func:`label_smoothing_kl_logits` on each depth
    slice, but the backward is one fused elementwise kernel over the (D, N,
    S, V) stack instead of D per-slice grad broadcasts back into the stacked
    tensor (profile_bytes showed those per-depth ``broadcast_in_dim`` fusions
    costing ~1.4 GB/step at production shapes)."""
    pt = _ls_kl_pointwise_from_logits(stack, target[None], pad_idx, smoothing)
    return jnp.sum(pt, axis=(1, 2))


def multilabel_soft_margin_loss(x, y, row_valid=None):
    """torch.nn.functional.multilabel_soft_margin_loss (mean reduction),
    optionally restricted to valid batch rows."""
    loss = -(y * jax.nn.log_sigmoid(x) + (1 - y) * jax.nn.log_sigmoid(-x))
    return _masked_row_mean(loss.mean(axis=-1), row_valid)


class SetCriterion:
    """Pure-function loss container (no parameters)."""

    def __init__(
        self,
        num_classes: int,
        weight_dict: Dict[str, float],
        losses,
        pad_idx: int,
        smoothing: float = 0.5,
        eos_coef: float = 0.1,
        lloss_gau_mask: int = 1,
        lloss_beta: float = 1.0,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
    ):
        self.num_classes = num_classes
        self.weight_dict = weight_dict
        self.losses = list(losses)
        self.pad_idx = pad_idx
        self.smoothing = smoothing
        self.eos_coef = eos_coef
        self.lloss_gau_mask = lloss_gau_mask
        self.lloss_beta = lloss_beta
        self.counter_class_rate = jnp.asarray(COUNTER_CLASS_RATE, dtype=jnp.float32)

    # -- individual losses ----------------------------------------------------

    def loss_labels(self, outputs, targets, indices, num_segments, num_tokens):
        pred_count = outputs["pred_count"]  # (B, C)
        max_length = pred_count.shape[1] - 1
        n_gt = jnp.sum(targets["gt_mask"], axis=1)  # (B,)
        counter_target = jnp.minimum(n_gt, max_length)
        onehot = jax.nn.one_hot(counter_target, pred_count.shape[1], dtype=pred_count.dtype)
        weight = self.counter_class_rate[: max_length + 1]
        loss = cross_entropy_with_gaussian_mask(
            pred_count, onehot, weight, self.lloss_gau_mask, self.lloss_beta,
            row_valid=targets.get("batch_valid"),
        )
        return {"loss_counter": loss}

    def loss_segments(self, outputs, targets, indices, num_segments, num_tokens):
        pred = outputs["pred_segments"]  # (B, Q or K, 2)
        gt = targets["gt_segments"]      # (B, G, 2)
        mask = targets["gt_mask"]        # (B, G)
        B, G = mask.shape
        rows = jnp.arange(B)[:, None]
        src = pred[rows, indices]        # (B, G, 2)

        l1 = jnp.abs(src - gt).sum(-1)   # (B, G)
        loss_bbox = jnp.sum(jnp.where(mask, l1, 0.0)) / num_segments

        giou = jax.vmap(
            lambda s, t: jnp.diagonal(
                generalized_box_iou(segment_cl_to_xy(s), segment_cl_to_xy(t))
            )
        )(src, gt)  # (B, G)
        loss_giou = jnp.sum(jnp.where(mask, 1.0 - giou, 0.0)) / num_segments
        return {"loss_bbox": loss_bbox, "loss_giou": loss_giou}

    def loss_captions(self, outputs, targets, indices, num_segments, num_tokens):
        # ``caption_head == "logits"``: pred_captions carries raw logits in
        # compute dtype (train path — avoids storing the V-sized log-prob
        # tensor for backward); default: log-probs (eval / legacy callers).
        pred = outputs["pred_captions"]              # (N, Lc-1, V)
        cap = targets["cap_tokens"].reshape(pred.shape[0], -1)  # (N, Lc)
        if outputs.get("caption_head") == "logits":
            loss = label_smoothing_kl_logits(pred, cap[:, 1:], self.pad_idx, self.smoothing)
        else:
            loss = label_smoothing_kl(pred, cap[:, 1:], self.pad_idx, self.smoothing)
        return {"loss_caption": loss / num_tokens}

    def _masked_bce(self, pred, target, row_valid):
        loss = _bce_with_logits(pred, target)
        loss = jnp.where(row_valid[:, None], loss, 0.0)
        denom = jnp.clip(jnp.sum(row_valid) * pred.shape[1], 1)
        return jnp.sum(loss) / denom

    def loss_contexts(self, outputs, targets, indices, num_segments, num_tokens, memory_mask):
        row_valid = targets["gt_mask"].reshape(-1)  # (N,)
        if isinstance(memory_mask, tuple):
            # multimodal: mean of video/audio BCE (criterion.py:363-390)
            v = self._masked_bce(outputs["video_pred_memory_mask"], memory_mask[0], row_valid)
            a = self._masked_bce(outputs["audio_pred_memory_mask"], memory_mask[1], row_valid)
            return {"loss_context": (v + a) / 2}
        return {
            "loss_context": self._masked_bce(
                outputs["pred_memory_mask"], memory_mask, row_valid
            )
        }

    def loss_mask_prediction(self, outputs, targets, indices, num_segments, num_tokens):
        mask_prediction = outputs["backbone_mask_prediction"]  # (B, S)
        shapes = outputs["temporal_shapes"]
        starts = outputs["level_start_index"]
        flat_grid = attn_map_to_flat_grid(
            shapes, starts,
            outputs["sampling_locations_dec"], outputs["attn_weights_dec"],
        ).sum(axis=(1, 2))  # (B, S)

        if "mask_flatten" in outputs and outputs["mask_flatten"] is not None:
            flat_grid = jnp.where(
                outputs["mask_flatten"],
                jnp.min(flat_grid, axis=1, keepdims=True) - 1,
                flat_grid,
            )

        sparse_token_nums = outputs["sparse_token_nums"]  # (B,)
        K = outputs["backbone_topk_proposals"].shape[1]
        _, topk_idx = jax.lax.top_k(flat_grid, K)  # (B, K)
        keep = jnp.arange(K)[None] < sparse_token_nums[:, None]
        B, S = mask_prediction.shape
        rows = jnp.arange(B)[:, None]
        target = jnp.zeros((B, S), dtype=mask_prediction.dtype)
        # invalid slots write 1.0*0 at index 0 -> scatter a masked value instead
        target = target.at[rows, jnp.where(keep, topk_idx, S - 1)].max(
            jnp.where(keep, 1.0, 0.0)
        )
        return {
            "loss_mask_prediction": multilabel_soft_margin_loss(
                mask_prediction, target, row_valid=targets.get("batch_valid")
            )
        }

    def corr(self, outputs, targets, indices, num_segments, num_tokens):
        if outputs.get("backbone_topk_proposals") is None:
            return {}
        from ..ops.dam import compute_corr, idx_to_flat_grid

        shapes = outputs["temporal_shapes"]
        starts = outputs["level_start_index"]
        S = int(sum(int(t) for t in shapes))
        flat_topk = idx_to_flat_grid(S, outputs["backbone_topk_proposals"])
        flat_map = attn_map_to_flat_grid(
            shapes, starts,
            outputs["sampling_locations_dec"], outputs["attn_weights_dec"],
        ).sum(axis=(1, 2))
        corr = compute_corr(flat_topk, flat_map, shapes)
        return {
            "loss_corr": jax.lax.stop_gradient(
                _masked_row_mean(corr[0], targets.get("batch_valid"))
            )
        }

    # -- orchestration ----------------------------------------------------------

    def get_loss(self, loss, outputs, targets, indices, num_segments, num_tokens, memory_mask=None):
        if loss == "labels":
            return self.loss_labels(outputs, targets, indices, num_segments, num_tokens)
        if loss == "segments":
            return self.loss_segments(outputs, targets, indices, num_segments, num_tokens)
        if loss == "captions":
            return self.loss_captions(outputs, targets, indices, num_segments, num_tokens)
        if loss == "contexts":
            return self.loss_contexts(outputs, targets, indices, num_segments, num_tokens, memory_mask)
        if loss == "mask_prediction":
            return self.loss_mask_prediction(outputs, targets, indices, num_segments, num_tokens)
        if loss == "corr":
            return self.corr(outputs, targets, indices, num_segments, num_tokens)
        raise ValueError(f"unknown loss {loss!r}")

    def __call__(
        self,
        outputs: Dict,
        targets: Dict,
        indices: jnp.ndarray,                 # (B, G) final-layer matching
        indices_aux: Optional[jnp.ndarray],   # (layers-1, B, G)
        memory_mask: Optional[jnp.ndarray],   # (N, S) crop mask (1 = outside)
    ) -> Dict[str, jnp.ndarray]:
        # normalizers over the global batch (criterion.py:478-490)
        num_segments = jnp.clip(
            jnp.sum(targets["gt_mask"]).astype(jnp.float32), 1.0
        )
        cap = targets["cap_tokens"].reshape(-1, targets["cap_tokens"].shape[-1])
        num_tokens = jnp.clip(
            jnp.sum(cap[:, 1:] != self.pad_idx).astype(jnp.float32), 1.0
        )

        # train fast path: the full (depth, N, S, V) LOGITS stack — final +
        # aux caption losses vectorized over the depth axis in one pass
        # (loss_caption == stack[-1], loss_caption_{i} == stack[i])
        stacked_captions = outputs.get("pred_captions_all")

        losses: Dict[str, jnp.ndarray] = {}
        for loss in self.losses:
            if loss == "captions" and stacked_captions is not None:
                per_depth = label_smoothing_kl_logits_stack(
                    stacked_captions, cap[:, 1:], self.pad_idx, self.smoothing
                ) / num_tokens  # (depth,)
                losses["loss_caption"] = per_depth[-1]
                for i in range(stacked_captions.shape[0] - 1):
                    losses[f"loss_caption_{i}"] = per_depth[i]
                continue
            losses.update(
                self.get_loss(loss, outputs, targets, indices, num_segments, num_tokens, memory_mask)
            )

        if "aux_outputs" in outputs:
            for i, aux in enumerate(outputs["aux_outputs"]):
                idx = indices_aux[i]
                for loss in self.losses:
                    if loss in ("captions", "contexts", "mask_prediction", "corr"):
                        continue
                    l_dict = self.get_loss(loss, aux, targets, idx, num_segments, num_tokens)
                    losses.update({f"{k}_{i}": v for k, v in l_dict.items()})

        if "aux_outputs_caption" in outputs:
            for i, aux in enumerate(outputs["aux_outputs_caption"]):
                if "captions" in self.losses:
                    l_dict = self.loss_captions(aux, targets, None, num_segments, num_tokens)
                    losses.update({f"{k}_{i}": v for k, v in l_dict.items()})

        if "aux_outputs_enc" in outputs:
            # parity quirk: the reference reuses the *decoder* aux matchings for
            # the encoder aux outputs (criterion.py:523-539)
            for i, aux in enumerate(outputs["aux_outputs_enc"]):
                idx = indices_aux[i]
                for loss in self.losses:
                    if loss in ("captions", "contexts", "mask_prediction", "corr"):
                        continue
                    l_dict = self.get_loss(loss, aux, targets, idx, num_segments, num_tokens)
                    losses.update({f"{k}_enc_{i}": v for k, v in l_dict.items()})

        return losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """Loss-name -> coefficient map incl. aux suffixes; reference
    models/__init__.py:123-165."""
    dvc = cfg.dvc
    weight_dict = {
        "loss_ce": dvc.cls_loss_coef,
        "loss_counter": dvc.counter_loss_coef,
        "loss_bbox": dvc.bbox_loss_coef,
        "loss_giou": dvc.giou_loss_coef,
        "loss_self_iou": dvc.self_iou_loss_coef,
        "loss_caption": dvc.caption_loss_coef,
        "loss_context": dvc.context_loss_coef,
        "loss_mask_prediction": dvc.mask_prediction_coef,
        "loss_corr": dvc.corr_coef,
    }
    if dvc.aux_loss:
        aux = {}
        for i in range(cfg.dvc.detr.dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in weight_dict.items() if k != "loss_caption"})
        for i in range(cfg.dvc.caption.depth - 1):
            aux[f"loss_caption_{i}"] = weight_dict["loss_caption"]
        weight_dict.update(aux)
    if dvc.use_sparse_detr and cfg.dvc.detr.use_enc_aux_loss:
        enc_aux = {}
        base = {k: v for k, v in weight_dict.items() if "_enc_" not in k and not k[-1].isdigit()}
        for i in range(cfg.dvc.detr.enc_layers - 1):
            enc_aux.update({f"{k}_enc_{i}": v for k, v in base.items()})
        weight_dict.update(enc_aux)
    return weight_dict
