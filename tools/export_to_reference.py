"""Export one of our orbax checkpoints as a reference-loadable .pth.

The reverse of ``--from-reference-checkpoint``: takes a checkpoint directory
written by main.py (engine/state.py orbax format), transplants the flagship
UnimodalSparseDVC params into the reference's state_dict naming
(utils/ref_bridge.py::transplant — the mapping the full-model parity test is
built on), and torch.saves ``{'model': state_dict, 'epoch': N}`` exactly as
the reference's own main.py:129-134 does, so the reference can resume it via
``cfg.resume``.

Usage:
  python tools/export_to_reference.py --resume runs/conv/checkpoint \\
      --out reference_checkpoint.pth [--synthetic] [--config-overrides k=v ...]

The config flags must match the ones the checkpoint was trained with (same
rule as inference.py --resume).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--config-overrides", nargs="*", default=[])
    args = p.parse_args()

    from multimodal_feature_learning_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    import jax
    import numpy as np
    import torch

    from main import apply_overrides, make_synthetic_world
    from multimodal_feature_learning_tpu.config import (
        load_config,
        recompute_losses,
    )
    from multimodal_feature_learning_tpu.data.anet import build_dataset
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model
    from multimodal_feature_learning_tpu.utils.ref_bridge import transplant

    cfg = load_config("train")
    if args.synthetic:
        cfg = make_synthetic_world(cfg)
    cfg = apply_overrides(cfg, args.config_overrides)
    recompute_losses(cfg)

    val_ds, vocab = build_dataset("val", cfg)
    model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx,
                        vocab.eos_idx)
    anet = cfg.dataset.activity_net
    B, T, D = args.batch_size, anet.video_rescale_len, cfg.dvc.detr.feature_dim
    G, Lc = anet.max_gt_target_segments, anet.max_caption_len_all
    init_batch = {
        "video_tensor": np.zeros((B, T, D), np.float32),
        "video_mask": np.zeros((B, T), bool),
        "durations": np.ones((B,), np.float32),
        "gt_segments": np.zeros((B, G, 2), np.float32),
        "gt_mask": np.zeros((B, G), bool),
        "cap_tokens": np.full((B, G, Lc), vocab.pad_idx, np.int32),
    }
    params = model.init(jax.random.PRNGKey(cfg.seed), init_batch)
    state = create_train_state(params, make_optimizer(cfg, 1))
    restored = load_checkpoint(args.resume, state)
    params = jax.device_get(restored["state"].params)

    sd = transplant(params, cfg)
    torch.save({"model": sd, "epoch": int(restored["epoch"])}, args.out)
    n = sum(v.numel() for v in sd.values())
    print(f"exported {args.resume} (epoch {restored['epoch']}) -> {args.out}: "
          f"{len(sd)} tensors, {n/1e6:.2f} M params")


if __name__ == "__main__":
    main()
