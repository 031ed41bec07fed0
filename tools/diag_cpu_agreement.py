"""Score a saved ours-submission against the saved torch-reference submission
(run after quality_compare --skip-torch): agreement + same-scorer deltas."""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_compare import agreement  # noqa: E402


def main():
    ours_path, ref_path = sys.argv[1], sys.argv[2]
    sub_ours = json.load(open(ours_path))
    sub_ref = json.load(open(ref_path))

    from multimodal_feature_learning_tpu.config import load_config_train
    from multimodal_feature_learning_tpu.evaluation import run_eval
    from multimodal_feature_learning_tpu.utils.postprocess import pprint_eval_scores

    cfg = load_config_train()
    gt = os.path.join(cfg.dataset.activity_net.anet_path,
                      "val_data_1_with_action_classes.json")

    rows = {}
    for name, sub in (("ours", sub_ours), ("ref", sub_ref)):
        random.seed(1234)
        rows[name] = pprint_eval_scores(run_eval(cfg.eval, sub, gt), debug=False)

    agree, ts_delta, n = agreement(sub_ours, sub_ref)
    print(f"agreement: {100 * agree:.2f}% over {n} rows, ts delta {ts_delta:.4f}s")
    for m in ("Bleu_1", "Bleu_2", "METEOR", "ROUGE_L", "CIDEr",
              "Recall", "Precision"):
        a, b = rows["ours"].get(m), rows["ref"].get(m)
        print(f"{m:10s} ours={a:9.4f} ref={b:9.4f} delta={abs(a - b):7.4f}")


if __name__ == "__main__":
    main()
