"""Discriminating experiment: grouped shared-KV greedy decode (groups=G)
vs materialized per-event decode (groups=1, memory repeated per event) at
PRODUCTION dims with the converged checkpoint. Any row mismatch = grouped-KV
row-permutation or masking bug."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from quality_compare import build_world, parse_args, train_briefly  # noqa: E402


def main():
    sys.argv = [sys.argv[0], "--n-videos", "16", "--checkpoint", "runs/conv/checkpoint"]
    args = parse_args()

    from multimodal_feature_learning_tpu.data.loader import split_batch
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, load_checkpoint, make_optimizer,
    )
    from multimodal_feature_learning_tpu.models.caption_decoder import greedy_decode
    from multimodal_feature_learning_tpu.parallel.mesh import make_mesh

    cfg, vocab, model, train_loader, val_loader, val_ds = build_world(args)
    mesh = make_mesh()
    params, criterion, weight_dict = train_briefly(cfg, model, train_loader, mesh, 0)
    tx = make_optimizer(cfg, steps_per_epoch=max(len(train_loader), 1))
    restored = load_checkpoint(args.checkpoint, create_train_state(params, tx))
    params = restored["state"].params

    batch = next(iter(val_loader))
    arrays, meta = split_batch(batch)

    out, indices, _ = model._propose_and_match(
        params, arrays, deterministic=True, with_aux=False
    )
    memory, crop_mask, caption_pad_mask, _ = model._prepare_caption_inputs(
        params, out, arrays, indices
    )
    G = model.max_gt
    B, S, D = memory.shape

    caps_grouped = greedy_decode(
        model.caption_decoder, params["caption"], memory, caption_pad_mask,
        model.seq_len, model.bos_idx, model.eos_idx, model.pad_idx,
        groups=G,
    )
    mem_rep = jnp.repeat(memory, G, axis=0)  # (B*G, S, D)
    caps_mat = greedy_decode(
        model.caption_decoder, params["caption"], mem_rep, caption_pad_mask,
        model.seq_len, model.bos_idx, model.eos_idx, model.pad_idx,
        groups=1,
    )
    a = np.asarray(caps_grouped)
    b = np.asarray(caps_mat)
    gt_mask = np.asarray(arrays["gt_mask"]).reshape(-1)
    rows = np.where(gt_mask)[0]
    same = (a[rows] == b[rows]).all(axis=1)
    print(f"rows={len(rows)} exact-match={same.sum()} mismatched={len(rows) - same.sum()}")
    if not same.all():
        bad = rows[~same][:5]
        for r in bad:
            print(f"row {r} (b={r // G}, g={r % G}):")
            print("  grouped:", a[r][:12])
            print("  mater. :", b[r][:12])
        # is it a permutation within the video's group?
        perm_hits = 0
        for r in rows[~same]:
            bvid = r // G
            grp = [bvid * G + g for g in range(G)]
            if any((a[r] == b[r2]).all() for r2 in grp):
                perm_hits += 1
        print(f"mismatched rows whose grouped caption equals SOME materialized "
              f"row in the same video: {perm_hits}/{int((~same).sum())}")


if __name__ == "__main__":
    main()
