"""Bootstrap the per-metric score delta between two saved submissions.

Resamples videos with replacement and rescoring both submissions on each
resample gives the sampling distribution of the delta — quantifying how much
of a measured METEOR/CIDEr gap is video-sampling noise vs systematic.

Usage: python tools/bootstrap_delta.py ours.json ref.json [n_boot]
"""

import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ours_path, ref_path = sys.argv[1], sys.argv[2]
    n_boot = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    sub_ours = json.load(open(ours_path))
    sub_ref = json.load(open(ref_path))

    from multimodal_feature_learning_tpu.config import load_config_train
    from multimodal_feature_learning_tpu.evaluation import run_eval
    from multimodal_feature_learning_tpu.utils.postprocess import pprint_eval_scores

    cfg = load_config_train()
    gt = os.path.join(cfg.dataset.activity_net.anet_path,
                      "val_data_1_with_action_classes.json")

    keys = sorted(sub_ours["results"])
    metrics = ("METEOR", "CIDEr")
    rng = np.random.default_rng(0)

    def score_subset(sub, subset):
        # resampled duplicates are disambiguated by key suffixing in both the
        # submission and a GT restricted to the subset — instead, simpler and
        # equally valid: score on the unique set of sampled keys (bootstrap on
        # the video inclusion indicator)
        s = {"results": {k: sub["results"][k] for k in subset},
             "version": sub.get("version", "VERSION 1.0"),
             "external_data": sub.get("external_data", {})}
        random.seed(1234)
        return pprint_eval_scores(run_eval(cfg.eval, s, gt), debug=False)

    deltas = {m: [] for m in metrics}
    for i in range(n_boot):
        subset = sorted(set(rng.choice(keys, size=len(keys), replace=True)))
        a = score_subset(sub_ours, subset)
        b = score_subset(sub_ref, subset)
        for m in metrics:
            deltas[m].append(a[m] - b[m])
        if (i + 1) % 25 == 0:
            print(f"# {i + 1}/{n_boot}", file=sys.stderr)

    print(f"bootstrap over {len(keys)} videos, {n_boot} resamples "
          f"(signed delta = ours - ref):")
    for m in metrics:
        d = np.array(deltas[m])
        print(f"{m:7s} mean {d.mean():+.4f}  std {d.std():.4f}  "
              f"[2.5%, 97.5%] = [{np.percentile(d, 2.5):+.4f}, "
              f"{np.percentile(d, 97.5):+.4f}]")


if __name__ == "__main__":
    main()
