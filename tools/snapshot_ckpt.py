"""Durable params-only checkpoint snapshots.

Long convergence runs write orbax checkpoints under runs/ (gitignored, lost on
environment resets). This tool round-trips the *parameters* through a single
compressed .npz so a converged run can be committed to git (~150 MB at bf16
for the 75.8M-param flagship) and later re-hydrated into an orbax checkpoint
dir that `main.py --resume` and `tools/quality_compare.py --checkpoint` accept
(optimizer state is re-initialized to zero — disaster recovery, not bitwise
resume continuity).

Usage:
  python tools/snapshot_ckpt.py export runs/conv/checkpoint snapshots/conv_e99.npz
  python tools/snapshot_ckpt.py restore snapshots/conv_e99.npz runs/conv/checkpoint \
      [--config-overrides ...]   # overrides must rebuild the same model family
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEP = "||"  # path separator inside npz keys (param names may contain '/')


def _flatten(params):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        name = SEP.join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        out[name] = np.asarray(leaf)
    return out


def export(ckpt_dir: str, out_path: str, dtype: str) -> None:
    from multimodal_feature_learning_tpu.engine.state import load_checkpoint

    restored = load_checkpoint(ckpt_dir)
    params = restored["state"]["params"]
    epoch = int(restored["epoch"])
    flat = _flatten(params)
    store = {}
    for name, arr in flat.items():
        arr = np.asarray(arr)
        if dtype == "bfloat16" and arr.dtype == np.float32:
            # npz has no bf16: truncate the mantissa and store the raw uint16
            # upper halves; restore() re-expands. Keeps exponent range (fp16
            # would overflow some optimizer-scale stats).
            u = arr.view(np.uint32)
            store["BF16" + SEP + name] = (np.right_shift(u, 16)).astype(np.uint16)
        else:
            store[name] = arr
    store["__epoch__"] = np.asarray(epoch)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **store)
    size = os.path.getsize(out_path) / 1e6
    print(f"exported {len(flat)} arrays (epoch {epoch}) -> {out_path} ({size:.1f} MB)")


def _unflatten_into(template_params, flat):
    import jax

    paths, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    leaves = []
    for path, leaf in paths:
        name = SEP.join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if name not in flat:
            raise KeyError(f"snapshot missing param {name}")
        arr = flat[name]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch {name}: {arr.shape} vs {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_params), leaves
    )


def restore(npz_path: str, ckpt_dir: str, overrides) -> None:
    import jax

    from multimodal_feature_learning_tpu.config import load_config_train
    from multimodal_feature_learning_tpu.config.defaults import recompute_losses
    from multimodal_feature_learning_tpu.data.anet import build_dataset
    from multimodal_feature_learning_tpu.data.loader import DataLoader, split_batch
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer, save_checkpoint,
    )
    from multimodal_feature_learning_tpu.models import build_model_and_criterion

    cfg = load_config_train()
    from main import apply_overrides  # same override grammar as the CLI

    apply_overrides(cfg, overrides)
    recompute_losses(cfg)

    data = np.load(npz_path)
    flat = {}
    epoch = 0
    for key in data.files:
        if key == "__epoch__":
            epoch = int(data[key])
        elif key.startswith("BF16" + SEP):
            u = data[key].astype(np.uint32)
            flat[key[len("BF16" + SEP):]] = np.left_shift(u, 16).view(np.float32)
        else:
            flat[key] = data[key]

    anet = cfg.dataset.activity_net
    train_ds, vocab = build_dataset("train", cfg)
    model, _, _ = build_model_and_criterion(cfg, vocab)
    dl = DataLoader(
        train_ds, 2, vocab.pad_idx,
        video_rescale_len=anet.video_rescale_len,
        max_gt=anet.max_gt_target_segments,
        max_caption_len=anet.max_caption_len_all,
        audio_rescale_len=(anet.audio_rescale_len
                           if len(cfg.dvc.input_modalities) == 2 else 0),
        shuffle=False, seed=0,
    )
    arrays0, _ = split_batch(next(iter(dl)))
    params = model.init(jax.random.PRNGKey(0), arrays0)
    params = _unflatten_into(params, flat)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(params, tx)
    out_dir = os.path.dirname(os.path.abspath(ckpt_dir)) or "."
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.basename(ckpt_dir.rstrip("/"))
    path = save_checkpoint(out_dir, state, epoch, name=name)
    print(f"restored snapshot (epoch {epoch}) -> {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["export", "restore"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="export storage dtype (bf16 halves the file; restore "
                        "upcasts back to the param dtype)")
    p.add_argument("--config-overrides", nargs="*", default=[])
    args = p.parse_args()
    if args.mode == "export":
        export(args.src, args.dst, args.dtype)
    else:
        restore(args.src, args.dst, args.config_overrides)


if __name__ == "__main__":
    main()
