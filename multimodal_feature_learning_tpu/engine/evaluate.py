"""Evaluation loop: jitted eval step -> submission JSON -> scoring.

Behavioral spec: reference ``engine.py:160-293`` — no-grad forward with greedy
(or teacher-forced) captioning, val losses, denormalized matched segments,
caption strings, per-batch submission accumulation, pycocoeval scoring, and
rank-0 submission save.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import split_batch
from ..ops.segment_ops import denormalize_segments
from ..parallel.mesh import shard_batch
from ..utils.postprocess import (
    captions_to_string,
    get_sample_submission,
    pprint_eval_scores,
    save_submission,
)
from .logging import MetricLogger


def make_eval_step(
    model,
    criterion,
    weight_dict,
    val_mode: str = "one_by_one",
    faster_eval: bool = False,
    beam_size: int = 0,
    length_penalty: float = 0.0,
):
    """Returns jitted (params, batch) -> (captions, denorm_segments, losses).

    val_mode 'one_by_one'|'teacher_forcing'|'beam'; faster_eval mirrors the
    reference model flag (unimodal_sparse_dvc.py:111)."""

    def eval_step(params, batch):
        out, captions, indices, indices_aux, memory_mask = model.forward_eval(
            params, batch, val_mode,
            faster_eval=faster_eval,
            beam_size=beam_size,
            length_penalty=length_penalty,
        )
        losses = criterion(out, batch, indices, indices_aux, memory_mask)
        total = sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)
        losses["loss"] = total
        B, G = indices.shape
        rows = jnp.arange(B)[:, None]
        matched = out["pred_segments"][rows, indices]  # (B, G, 2)
        denorm = denormalize_segments(matched, batch["durations"][:, None])
        return captions, denorm, losses

    return jax.jit(eval_step)


def evaluate(
    model,
    criterion,
    weight_dict,
    eval_step,
    params,
    loader,
    mesh,
    vocab,
    cfg,
    epoch: int = 0,
    score_fn=None,
    max_batches: Optional[int] = None,
):
    """Runs the eval epoch; returns (val_stats, submission, scores)."""
    metric_logger = MetricLogger()
    submission = get_sample_submission()
    G = cfg.dataset.activity_net.max_gt_target_segments

    n_done = 0
    for batch in metric_logger.log_every(loader, cfg.print_freq, f"Eval: [{epoch}]"):
        arrays, meta = split_batch(batch)
        sharded = shard_batch(arrays, mesh)
        captions, denorm, losses = eval_step(params, sharded)

        # ONE host transfer for everything (per-key float() pays a tunnel
        # round-trip each on the axon platform)
        captions, denorm, losses = jax.device_get((captions, denorm, losses))
        captions = np.asarray(captions)      # (B*G, Lc+1)
        denorm = np.asarray(denorm)          # (B, G, 2)
        gt_mask = np.asarray(arrays["gt_mask"])
        strings = captions_to_string(captions, vocab)

        for b, key in enumerate(meta["keys"]):
            results = []
            for g in range(G):
                if not gt_mask[b, g]:
                    continue
                results.append(
                    {
                        "sentence": strings[b * G + g],
                        "timestamp": [float(denorm[b, g, 0]), float(denorm[b, g, 1])],
                    }
                )
            submission["results"][key] = results

        metric_logger.update(
            **{k: float(v) for k, v in losses.items()
               if not any(ch.isdigit() for ch in k)}
        )
        n_done += 1
        if max_batches is not None and n_done >= max_batches:
            break

    stats = {k: meter.global_avg for k, meter in metric_logger.meters.items()}

    scores = None
    if score_fn is not None:
        scores = score_fn(submission)
        scores = pprint_eval_scores(scores, debug=cfg.eval.verbose)
        print("Eval scores:", scores)

    if cfg.save_submission and jax.process_index() == 0:
        os.makedirs(cfg.submission_dir, exist_ok=True)
        save_submission(
            submission,
            os.path.join(cfg.submission_dir, f"submission_epoch_{epoch:04d}.json"),
        )

    return stats, submission, scores
