"""Corpus BLEU-1..4 (Papineni et al. 2002), COCO-caption conventions.

Matches the pycocoevalcap Bleu scorer as patched by the reference
(README.md:35-49: ``option='closest'``): clipped n-gram precision accumulated
over the segment set, brevity penalty from the closest reference length, and
the COCO "ratio epsilon" smoothing on the final geometric mean.
"""

from __future__ import annotations

from collections import Counter
from math import exp, log
from typing import Dict, List, Tuple


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


class Bleu:
    def __init__(self, n: int = 4):
        self.n = n

    def method(self):
        return "Bleu"

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[List[float], List[List[float]]]:
        small = 1e-9
        tiny = 1e-15
        correct = [0] * self.n
        total = [0] * self.n
        cand_len = 0
        ref_len = 0

        for key in gts:
            hyp = res[key][0].split()
            refs = [r.split() for r in gts[key]]
            cand_len += len(hyp)
            # closest reference length (ties -> shorter, per NIST convention)
            ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
            for n in range(1, self.n + 1):
                hyp_ng = _ngrams(hyp, n)
                max_ref = Counter()
                for r in refs:
                    for ng, c in _ngrams(r, n).items():
                        max_ref[ng] = max(max_ref[ng], c)
                correct[n - 1] += sum(min(c, max_ref[ng]) for ng, c in hyp_ng.items())
                total[n - 1] += max(len(hyp) - n + 1, 0)

        ratio = cand_len / (ref_len + tiny)
        bp = 1.0 if ratio > 1.0 else exp(1 - 1 / (ratio + tiny))

        scores = []
        s = 0.0
        for n in range(self.n):
            p = (correct[n] + tiny) / (total[n] + small)
            s += log(p)
            scores.append(exp(s / (n + 1)) * bp)
        return scores, [scores]
