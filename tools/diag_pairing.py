"""One-batch pairing diagnostic: print ours vs torch-reference rows per video.

Identical weights + identical inputs ==> if caption<->segment pairing is
consistent on both sides, each video's (timestamp, sentence) row SET must
match. Prints the rows sorted by timestamp so pairing scrambles show up as
the same timestamps carrying different sentences.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from quality_compare import build_world, parse_args, torch_submission, train_briefly  # noqa: E402


def main():
    sys.argv = [sys.argv[0], "--n-videos", "16", "--checkpoint", "runs/conv/checkpoint"]
    args = parse_args()

    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, load_checkpoint, make_optimizer,
    )
    from multimodal_feature_learning_tpu.parallel.mesh import make_mesh

    cfg, vocab, model, train_loader, val_loader, val_ds = build_world(args)
    mesh = make_mesh()
    params, criterion, weight_dict = train_briefly(cfg, model, train_loader, mesh, 0)
    tx = make_optimizer(cfg, steps_per_epoch=max(len(train_loader), 1))
    restored = load_checkpoint(args.checkpoint, create_train_state(params, tx))
    params = restored["state"].params

    from quality_compare import our_submission

    sub_ours = our_submission(
        cfg, model, params, criterion, weight_dict, val_loader, mesh, vocab
    )
    sub_ref = torch_submission(cfg, params, val_loader, vocab)

    for key in list(sub_ours["results"])[:6]:
        print(f"\n=== {key} ===")
        a = sorted(sub_ours["results"][key], key=lambda r: r["timestamp"])
        b = sorted(sub_ref["results"].get(key, []), key=lambda r: r["timestamp"])
        for ra in a:
            print(f"  ours [{ra['timestamp'][0]:7.2f},{ra['timestamp'][1]:7.2f}] {ra['sentence']}")
        for rb in b:
            print(f"  ref  [{rb['timestamp'][0]:7.2f},{rb['timestamp'][1]:7.2f}] {rb['sentence']}")


if __name__ == "__main__":
    main()
