"""Host-side prediction postprocessing.

Behavioral spec: reference ``utils/preds_postprocess.py`` — strip special
tokens, drop the first and last remaining token, dedup consecutive repeats and
stray punctuation (:83-104, :138-152); submission JSON skeleton (:5-13);
average scores + F1 (:112-135).
"""

from __future__ import annotations

import json
from typing import Dict, List


def get_sample_submission() -> Dict:
    return {
        "version": "VERSION 1.0",
        "results": {},
        "external_data": {"used": True, "details": "DVC"},
    }


def pre_process(captions: List[str]) -> List[str]:
    """Dedup consecutive tokens + drop stray punctuation (reference :138-152)."""
    for i, caption in enumerate(captions):
        tokens = caption.split()
        if len(tokens) == 0:
            captions[i] = ""
            continue
        res = [tokens[0]]
        for tok in tokens[1:]:
            if tok in [".", ",", "/", "'"]:
                continue
            if res[-1] == tok:
                continue
            res.append(tok)
        captions[i] = " ".join(res)
    return captions


def captions_to_string(captions, vocab) -> List[str]:
    """Token-id rows -> strings.  Matches the reference (:83-104) including its
    quirk of slicing [1:-1] AFTER removing the specials."""
    unwanted = {vocab.pad_idx, vocab.bos_idx, vocab.eos_idx, vocab["<unk>"]}
    itos = vocab.get_itos()
    out = []
    for caption in captions:
        words = [itos[int(t)] for t in caption if int(t) not in unwanted]
        out.append(" ".join(words[1:-1]))
    return pre_process(out)


def save_submission(json_data: Dict, json_file_path: str):
    with open(json_file_path, "w") as f:
        json.dump(json_data, f, indent=4)


def pprint_eval_scores(scores: Dict, debug: bool = False) -> Dict:
    avg_scores = {}
    for metric in scores:
        if isinstance(scores[metric], list):
            score = scores[metric]
            avg_scores[metric] = 100 * sum(score) / float(len(score))
            if debug:
                print("| %s: %2.4f" % (metric, avg_scores[metric]))
        else:
            avg_scores[metric] = scores[metric]
    if (avg_scores.get("Precision", 0) + avg_scores.get("Recall", 0)) > 0:
        avg_scores["F1_score"] = (
            2 * avg_scores["Precision"] * avg_scores["Recall"]
            / (avg_scores["Precision"] + avg_scores["Recall"])
        )
    else:
        avg_scores["F1_score"] = 0.0
    return avg_scores
