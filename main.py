"""Train/val driver for the TPU-native DVC framework.

Behavioral spec: reference ``main.py:23-197`` — seeding, distributed init,
dataset/loader build, model+criterion build, AdamW + StepLR, epoch loop with
periodic eval, checkpoint save/resume, JSONL logs.  Config-driven like the
reference, but the train/test switch is a CLI flag instead of a hardcoded
boolean (config/config_dvc.py:11).

Usage:
  python main.py [--mode train|eval] [--config-overrides k=v ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "eval"])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--from-reference-checkpoint", default=None,
                   help="migrate a reference-trained .pth (main.py:129-134 "
                        "format) into the flagship UnimodalSparseDVC params")
    p.add_argument("--trust-checkpoint", action="store_true",
                   help="allow the full pickle loader for reference "
                        ".pth files that weights_only rejects "
                        "(executes code embedded in the file)")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic features/annotations smoke run (no data needed)")
    p.add_argument("--config-overrides", nargs="*", default=[],
                   help="dotted config overrides, e.g. dvc.d_model=256")
    return p.parse_args()


def apply_overrides(cfg, overrides):
    for kv in overrides:
        key, val = kv.split("=", 1)
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = getattr(node, part)
        old = getattr(node, parts[-1])
        typ = type(old)
        if typ is bool:
            new = val in ("1", "true", "True")
        elif typ is list:
            items = [v for v in val.split(",") if v]  # e.g. video,audio
            # coerce to the existing element type (eval.tious floats etc.);
            # an empty default list keeps raw strings
            el = type(old[0]) if old else str
            new = [el(v) for v in items] if el is not str else items
        else:
            new = typ(val)
        setattr(node, parts[-1], new)
    return cfg


def _host_rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def make_synthetic_world(cfg, tmpdir="./synthetic_anet"):
    """Writes tiny synthetic annotations so the full pipeline runs without
    ActivityNet on disk (the reference's for_testing/make_h5 pattern)."""
    os.makedirs(tmpdir, exist_ok=True)
    rng = np.random.default_rng(cfg.seed)
    words = ["a", "man", "is", "playing", "guitar", "the", "dog", "runs",
             "across", "field", "person", "rides", "bike", "crowd", "cheers"]
    for split, n in (("train.json", 64), ("val_data_1_with_action_classes.json", 32)):
        ann = {}
        for i in range(n):
            dur = float(rng.uniform(10, 120))
            k = int(rng.integers(1, 5))
            stamps, sents = [], []
            for _ in range(k):
                s = float(rng.uniform(0, dur * 0.7))
                e = float(rng.uniform(s + 1.0, dur))
                stamps.append([s, e])
                sents.append(" ".join(rng.choice(words, size=int(rng.integers(4, 9)))))
            ann[f"{split[:2]}_{i:05d}"] = {
                "duration": dur, "timestamps": stamps, "sentences": sents,
            }
        with open(os.path.join(tmpdir, split), "w") as f:
            json.dump(ann, f)
    cfg.dataset.activity_net.anet_path = tmpdir
    cfg.dataset.activity_net.vocab_file_path = os.path.join(tmpdir, "vocab.pkl")
    return cfg


def main():
    args = parse_args()

    from multimodal_feature_learning_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    from multimodal_feature_learning_tpu.config import load_config
    from multimodal_feature_learning_tpu.data.anet import build_dataset
    from multimodal_feature_learning_tpu.data.loader import DataLoader, split_batch
    from multimodal_feature_learning_tpu.engine.evaluate import evaluate, make_eval_step
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
        save_checkpoint,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step, train_one_epoch
    from multimodal_feature_learning_tpu.evaluation import run_eval
    from multimodal_feature_learning_tpu.models import build_model_and_criterion
    from multimodal_feature_learning_tpu.parallel.mesh import (
        make_mesh,
        maybe_initialize_distributed,
        replicate_params,
    )

    maybe_initialize_distributed()
    # persistent compile cache: repeated runs skip the ~20-40s cold JIT
    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = load_config("train")
    if args.synthetic:
        cfg = make_synthetic_world(cfg)
    cfg = apply_overrides(cfg, args.config_overrides)
    from multimodal_feature_learning_tpu.config import recompute_losses

    recompute_losses(cfg)  # losses follow the family/mask flags after overrides
    if args.epochs is not None:
        cfg.epochs = args.epochs
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.output_dir is not None:
        cfg.output_dir = args.output_dir
        cfg.submission_dir = os.path.join(cfg.output_dir, "submission")
    if args.resume is not None:
        cfg.resume = args.resume

    os.makedirs(cfg.output_dir, exist_ok=True)
    np.random.seed(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed)

    # data (feature pipeline, or raw decode pipeline when use_raw_videos)
    anet = cfg.dataset.activity_net
    if cfg.use_raw_videos:
        from functools import partial

        from multimodal_feature_learning_tpu.data.raw_anet import (
            build_raw_dataset,
            collate_raw,
        )

        train_ds, vocab = build_raw_dataset("train", cfg)
        val_ds, _ = build_raw_dataset("val", cfg, vocab)
        raw_collate = partial(
            collate_raw, pad_idx=vocab.pad_idx,
            max_gt=anet.max_gt_target_segments,
            max_caption_len=anet.max_caption_len_all,
        )
        mk_loader = lambda ds, shuffle: DataLoader(
            ds, cfg.batch_size, vocab.pad_idx,
            shuffle=shuffle, seed=cfg.seed, collate_fn=raw_collate,
        )
    else:
        train_ds, vocab = build_dataset("train", cfg)
        val_ds, _ = build_dataset("val", cfg, vocab)
        # multimodal feature family: the collate also rescales/masks audio
        audio_len = (anet.audio_rescale_len
                     if len(cfg.dvc.input_modalities) == 2 else 0)
        mk_loader = lambda ds, shuffle: DataLoader(
            ds, cfg.batch_size, vocab.pad_idx,
            video_rescale_len=anet.video_rescale_len,
            max_gt=anet.max_gt_target_segments,
            max_caption_len=anet.max_caption_len_all,
            audio_rescale_len=audio_len,
            shuffle=shuffle, seed=cfg.seed,
        )
    if anet.val_subset:
        # deterministic subset for fast periodic scoring during training
        val_ds.keys = sorted(val_ds.keys)[: anet.val_subset]
    if anet.train_subset:
        # deterministic train subset (short family-convergence runs; the
        # vocab is still built from the full train split above)
        train_ds.keys = sorted(train_ds.keys)[: anet.train_subset]
    train_loader = mk_loader(train_ds, True)
    val_loader = mk_loader(val_ds, False)
    print(f"train videos: {len(train_ds)}  val videos: {len(val_ds)}  vocab: {len(vocab)}")

    # model + criterion (family dispatch per config flags)
    model, criterion, weight_dict = build_model_and_criterion(cfg, vocab)

    mesh = make_mesh(cfg.mesh.num_data, cfg.mesh.num_model)
    batch0 = next(iter(train_loader))
    arrays0, _ = split_batch(batch0)
    params = model.init(rng, arrays0)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f} M")
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

    tx = make_optimizer(cfg, steps_per_epoch=max(len(train_loader), 1))
    state = create_train_state(
        params, tx, master_dtype=getattr(cfg, "master_dtype", None))
    start_epoch = cfg.start_epoch
    if cfg.resume:
        restored = load_checkpoint(cfg.resume, state)
        state = restored["state"]
        start_epoch = restored["epoch"] + 1
        print(f"resumed from {cfg.resume} at epoch {start_epoch}")

    gt_path = os.path.join(anet.anet_path, "val_data_1_with_action_classes.json")
    score_fn = lambda sub: run_eval(cfg.eval, sub, gt_path)

    if args.mode == "eval":
        eval_step = make_eval_step(
            model, criterion, weight_dict, cfg.eval.val_mode,
            faster_eval=cfg.eval.faster_eval, beam_size=cfg.eval.beam_size,
            length_penalty=cfg.eval.length_penalty,
        )
        stats, submission, scores = evaluate(
            model, criterion, weight_dict, eval_step, state.params, val_loader,
            mesh, vocab, cfg, epoch=start_epoch, score_fn=score_fn,
        )
        print("val stats:", {k: round(v, 4) for k, v in stats.items()})
        return

    from multimodal_feature_learning_tpu.engine.state import make_lr_schedule

    schedule = make_lr_schedule(cfg.lr, cfg.lr_drop, max(len(train_loader), 1))
    train_step = make_train_step(model, criterion, weight_dict, tx, schedule)
    multi_step = None
    if cfg.steps_per_dispatch > 1:
        from multimodal_feature_learning_tpu.engine.train import (
            make_train_multistep,
        )

        multi_step = make_train_multistep(
            model, criterion, weight_dict, tx, schedule
        )
    eval_step = make_eval_step(
        model, criterion, weight_dict, cfg.eval.val_mode,
        faster_eval=cfg.eval.faster_eval, beam_size=cfg.eval.beam_size,
        length_penalty=cfg.eval.length_penalty,
    )

    wandb = None
    if cfg.wandb.on:
        try:
            import wandb as _wandb

            wandb = _wandb
            wandb.init(project=cfg.wandb.project, config=cfg.to_dict())
        except ImportError:
            print("wandb requested but not installed; continuing without it")

    step_logger = None
    if wandb is not None:
        # per-step metric stream (reference engine.py:299-314)
        step_logger = lambda log, step: wandb.log(
            {f"train_step/{k}": v for k, v in log.items()}, step=step
        )

    def version_checkpoint(path, epoch):
        """wandb artifact versioning (reference main.py:137-141)."""
        if wandb is None or path is None:
            return
        art = wandb.Artifact("model-checkpoint", type="model")
        art.add_dir(path)
        wandb.log_artifact(art, aliases=["latest", f"epoch-{epoch}"])

    print("Start training")
    t_start = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        state, train_stats = train_one_epoch(
            model, criterion, weight_dict, train_step, state, train_loader,
            mesh, rng, epoch, cfg.print_freq, step_logger=step_logger,
            multi_step=multi_step, chunk_k=cfg.steps_per_dispatch,
            transfer_dtype=(cfg.transfer_dtype
                            if cfg.transfer_dtype != "float32" else None),
        )
        ckpt_path = save_checkpoint(cfg.output_dir, state, epoch)
        # rate 0 = never keep numbered checkpoints (the rolling `checkpoint`
        # above is still written every epoch)
        if ((cfg.checkpoint_rate and (epoch + 1) % cfg.checkpoint_rate == 0)
                or (cfg.lr_drop and (epoch + 1) % cfg.lr_drop == 0)):
            save_checkpoint(cfg.output_dir, state, epoch, name=f"checkpoint{epoch:04d}")
            version_checkpoint(ckpt_path, epoch)

        log_stats = {f"train_{k}": v for k, v in train_stats.items()}
        log_stats.update({"epoch": epoch})

        if ((cfg.eval_rate and (epoch + 1) % cfg.eval_rate == 0)
                or epoch == cfg.epochs - 1):
            val_stats, _, scores = evaluate(
                model, criterion, weight_dict, eval_step, state.params,
                val_loader, mesh, vocab, cfg, epoch=epoch, score_fn=score_fn,
            )
            log_stats.update({f"val_{k}": v for k, v in val_stats.items()})
            if scores:
                log_stats.update({f"score_{k}": v for k, v in scores.items()})

        if jax.process_index() == 0:
            with open(os.path.join(cfg.output_dir, "train_log.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")
            # separate val_log.txt on eval epochs (reference main.py:159-168)
            val_items = {k: v for k, v in log_stats.items()
                         if k.startswith(("val_", "score_")) or k == "epoch"}
            if len(val_items) > 1:
                with open(os.path.join(cfg.output_dir, "val_log.txt"), "a") as f:
                    f.write(json.dumps(val_items) + "\n")
            if wandb is not None:
                # step must share the per-step stream's monotonic counter
                # (step_logger logs at step=global_step) or wandb drops
                # these rows as non-monotonic; state.step is the global
                # optimizer step at epoch end
                wandb.log(log_stats, step=int(state.step))

        # RSS watchdog: the experimental axon tunnel client leaks host
        # memory per dispatch (see COMPONENTS.md "Host-memory leak on the
        # axon tunnel") — exit cleanly at an epoch boundary, AFTER the
        # checkpoint save, rather than get OOM-killed mid-write. A resume
        # wrapper (relaunch with --resume until "Training done") continues.
        if cfg.rss_restart_gb and _host_rss_gb() > cfg.rss_restart_gb:
            print(f"host RSS {_host_rss_gb():.1f} GB > rss_restart_gb="
                  f"{cfg.rss_restart_gb}; exiting at epoch {epoch} for clean "
                  f"resume (checkpoint saved)")
            # EX_TEMPFAIL: distinguishable from a completed run ("Training
            # done" + exit 0) so automation doesn't mistake the early exit
            # for success
            sys.exit(75)

    print(f"Training done in {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
