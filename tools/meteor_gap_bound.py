"""Bound the METEOR-lite gap (missing WordNet-synonymy + paraphrase stages)
on real submissions.

The reference scores captions through the METEOR 1.5 Java jar
(/root/reference/evaluation/evaluate.py:249-258), whose English stage chain is
exact(1.0) > stem(0.6) > synonym(0.8) > paraphrase(0.6). Our dependency-free
port (evaluation/metrics/meteor.py) runs exact+stem always; the synonymy AND
paraphrase stages are both implemented but data-gated (need a WordNet synset
dump / paraphrase-en table, absent from this image), so default scores are a
lower bound on jar METEOR. This tool quantifies how loose that bound can be
on an actual submission pair:

  METEOR_upper: re-score with every exact+stem-UNMATCHED word on each side
  assumed matched at the higher data-gated stage weight (0.8), with the
  fragmentation chunk count held at the exact+stem value — each choice can
  only raise the score, so this is a hard upper bound on what the two
  data-gated stages could add (including unequal-length paraphrase spans).

Reported per tIoU and averaged, for the full segment stream and for the
stream excluding garbage-reference segments (unmatched proposals are scored
against a random 10-20 char token per the ANETcaptions protocol — a real
WordNet stage can never match those, so the "no-garbage" variant is the
tighter, realistic bound).

Usage: python tools/meteor_gap_bound.py quality_512_sub_ours.json \
           [quality_512_sub_ref.json ...]
"""

import json
import random
import sys

sys.path.insert(0, ".")

import numpy as np

from multimodal_feature_learning_tpu.evaluation.anet_eval import (
    ANETCaptionsEvaluator,
)
from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
    DELTA, FUNCTION_WORDS, _align, _score_from_stats, _segment_stats,
)

GT_PATH = "/root/reference/anet_data/val_data_1_with_action_classes.json"
TIOUS = [0.3, 0.5, 0.7, 0.9]
SYN_W = 0.8  # jar synonym-stage weight


def _is_garbage_ref(ref_line: str) -> bool:
    words = ref_line.split()
    return len(words) == 1 and len(words[0]) >= 10


def _upper_stats(hyp_line: str, ref_line: str):
    """Exact+stem stats augmented with the maximal possible contribution of
    BOTH data-gated stages (synonym w=0.8, paraphrase w=0.6): every
    exact+stem-unmatched word on EACH side is assumed matched at the higher
    stage weight 0.8. Unlike a min-paired bound this also dominates
    paraphrase span matches, which may pair unequal word counts (e.g. a
    5-word hyp phrase against a 1-word ref phrase adds hyp-side weighted
    matches for all 5 words). Returns (stats, n_pairable, n_unmatched_hyp)."""
    s = dict(_segment_stats(hyp_line, ref_line))
    hyp, ref = hyp_line.split(), ref_line.split()
    blocks = _align(hyp, ref)
    mh = {i + t for i, lh, _, _, _ in blocks for t in range(lh)}
    mr = {j + t for _, _, j, lr, _ in blocks for t in range(lr)}

    def w(word):
        return DELTA if word not in FUNCTION_WORDS else 1.0 - DELTA

    un_h = [w(x) for i, x in enumerate(hyp) if i not in mh]
    un_r = [w(x) for j, x in enumerate(ref) if j not in mr]
    k = min(len(un_h), len(un_r))
    s["w_match_h"] += SYN_W * sum(un_h)
    s["w_match_r"] += SYN_W * sum(un_r)
    # the fragmentation penalty gamma*(chunks/matches)^beta is decreasing in
    # matches, so crediting the larger side's count (chunks unchanged) can
    # only raise the score — still an upper bound
    s["matches"] += max(len(un_h), len(un_r))
    return s, k, len(un_h)


class MeteorVariant:
    """Scorer shim for ANETCaptionsEvaluator: base (exact+stem) or upper
    (max synonym augmentation), optionally skipping garbage-ref segments."""

    def __init__(self, upper: bool, skip_garbage: bool, counters):
        self.upper, self.skip_garbage, self.counters = upper, skip_garbage, counters

    def method(self):
        return "METEOR"

    def compute_score(self, gts, res):
        agg = {k: 0.0 for k in (
            "w_match_h", "w_match_r", "w_len_h", "w_len_r", "matches", "chunks"
        )}
        used = 0
        for key in gts:
            hyp, ref = res[key][0], gts[key][0]
            garbage = _is_garbage_ref(ref)
            if self.skip_garbage and garbage:
                continue
            used += 1
            if self.upper:
                stats, k, uh = _upper_stats(hyp, ref)
                if not self.skip_garbage:  # count each segment stream once
                    self.counters["pairable"] += k
                    self.counters["unmatched_hyp"] += uh
                    self.counters["segments"] += 1
                    self.counters["garbage_segments"] += int(garbage)
            else:
                stats = _segment_stats(hyp, ref)
            for kk in agg:
                agg[kk] += stats[kk]
        if used == 0:
            return 0.0, []
        return _score_from_stats(agg), []


def bound_for(submission, label):
    counters = {"pairable": 0, "unmatched_hyp": 0, "segments": 0,
                "garbage_segments": 0}
    gt = json.load(open(GT_PATH))
    out = {}
    for upper in (False, True):
        for skip_garbage in (False, True):
            random.seed(1234)  # same garbage strings as quality_compare.score
            ev = ANETCaptionsEvaluator(
                ground_truths=[gt], prediction=submission, tious=TIOUS,
                max_proposals=1000, verbose=False,
                scorers=[(MeteorVariant(upper, skip_garbage, counters),
                          "METEOR")],
            )
            scores = ev.evaluate()
            per_tiou = scores["METEOR"]  # one entry per tIoU
            name = ("upper" if upper else "base") + (
                "_nogarbage" if skip_garbage else "")
            out[name] = 100.0 * float(np.mean(per_tiou))
    print(f"\n== {label} ==")
    print(f"segments scored (x4 tIoUs): {counters['segments']} "
          f"({counters['garbage_segments']} garbage-ref)")
    print(f"exact+stem-unmatched candidate words: {counters['unmatched_hyp']}; "
          f"pairable with an unmatched ref word: {counters['pairable']}")
    for name, v in out.items():
        print(f"METEOR_{name}: {v:.4f}")
    print(f"gap bound (all): +{out['upper'] - out['base']:.4f}")
    print(f"gap bound (no-garbage segments): "
          f"+{out['upper_nogarbage'] - out['base_nogarbage']:.4f}")
    return out, counters


if __name__ == "__main__":
    for path in sys.argv[1:] or ["quality_512_sub_ours.json"]:
        sub = json.load(open(path))
        if "results" not in sub:
            sub = {"results": sub, "version": "VERSION 1.0",
                   "external_data": {}}
        bound_for(sub, path)
