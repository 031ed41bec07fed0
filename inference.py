"""Teacher-forcing inference driver.

Behavioral spec: reference ``inference.py:112-121`` — same setup as main.py,
one ``evaluate(..., val_mode='teacher_forcing')`` pass over val with scoring.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", default=None)
    p.add_argument("--from-reference-checkpoint", default=None,
                   help="migrate a reference-trained .pth (main.py:129-134 "
                        "format) into the flagship UnimodalSparseDVC params")
    p.add_argument("--trust-checkpoint", action="store_true",
                   help="allow the full pickle loader for reference "
                        ".pth files that weights_only rejects "
                        "(executes code embedded in the file)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--val-mode", default="teacher_forcing",
                   choices=["teacher_forcing", "one_by_one", "beam"],
                   help="decode mode (reference inference.py uses "
                        "teacher_forcing; one_by_one/beam generate)")
    p.add_argument("--config-overrides", nargs="*", default=[])
    args = p.parse_args()

    from multimodal_feature_learning_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    from main import apply_overrides, make_synthetic_world
    from multimodal_feature_learning_tpu.config import load_config
    from multimodal_feature_learning_tpu.data.anet import build_dataset
    from multimodal_feature_learning_tpu.data.loader import DataLoader, split_batch
    from multimodal_feature_learning_tpu.engine.evaluate import evaluate, make_eval_step
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from multimodal_feature_learning_tpu.evaluation import run_eval
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion,
        build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model
    from multimodal_feature_learning_tpu.parallel.mesh import make_mesh, replicate_params

    cfg = load_config("train")
    if args.synthetic:
        cfg = make_synthetic_world(cfg)
    cfg = apply_overrides(cfg, args.config_overrides)
    from multimodal_feature_learning_tpu.config import recompute_losses

    recompute_losses(cfg)
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.resume is not None:
        cfg.resume = args.resume

    np.random.seed(cfg.seed)
    anet = cfg.dataset.activity_net
    val_ds, vocab = build_dataset("val", cfg)
    val_loader = DataLoader(
        val_ds, cfg.batch_size, vocab.pad_idx,
        video_rescale_len=anet.video_rescale_len,
        max_gt=anet.max_gt_target_segments,
        max_caption_len=anet.max_caption_len_all,
        shuffle=False, seed=cfg.seed,
    )

    model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx)
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=vocab.pad_idx,
        smoothing=cfg.dvc.smoothing,
    )
    mesh = make_mesh(cfg.mesh.num_data, cfg.mesh.num_model)
    batch0 = next(iter(val_loader))
    arrays0, _ = split_batch(batch0)
    params = model.init(jax.random.PRNGKey(cfg.seed), arrays0)
    if args.from_reference_checkpoint:
        from multimodal_feature_learning_tpu.utils.ref_bridge import (
            load_reference_checkpoint,
        )

        params, leftover = load_reference_checkpoint(
            args.from_reference_checkpoint, jax.device_get(params), cfg,
            trust_pickle=args.trust_checkpoint,
        )
        print(f"imported reference checkpoint {args.from_reference_checkpoint} "
              f"({len(leftover)} reference-only keys skipped)")
    params = replicate_params(params, mesh)

    if cfg.resume:
        tx = make_optimizer(cfg, steps_per_epoch=1)
        state = create_train_state(params, tx)
        restored = load_checkpoint(cfg.resume, state)
        params = restored["state"].params

    gt_path = os.path.join(anet.anet_path, "val_data_1_with_action_classes.json")
    score_fn = lambda sub: run_eval(cfg.eval, sub, gt_path)
    eval_step = make_eval_step(
        model, criterion, weight_dict, args.val_mode,
        faster_eval=cfg.eval.faster_eval, beam_size=cfg.eval.beam_size,
        length_penalty=cfg.eval.length_penalty,
    )
    stats, submission, scores = evaluate(
        model, criterion, weight_dict, eval_step, params, val_loader, mesh,
        vocab, cfg, epoch=0, score_fn=score_fn,
    )
    print("val stats:", {k: round(float(v), 4) for k, v in stats.items()})


if __name__ == "__main__":
    main()
