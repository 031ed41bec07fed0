"""METEOR (Banerjee & Lavie 2005) — dependency-free implementation.

The reference pipeline spawns the METEOR 1.5 Java jar as a persistent
subprocess (pycocoevalcap; absent from the snapshot and JVM-dependent).  This
is a pure-Python implementation of the classic METEOR formulation: exact +
Porter-stem unigram alignment, F_mean = 10PR/(R + 9P), fragmentation penalty
0.5 * (chunks/matches)^3, max over references.  It tracks but does not equal
METEOR-1.5 (no WordNet synonymy/paraphrase tables); treat absolute values as
"meteor-lite".  The evaluator accepts any scorer object with this interface,
so the Java-backed scorer can be swapped in for bit-exact comparisons.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980), standard algorithm
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    m, prev_c = 0, True
    started = False
    for i in range(len(stem)):
        c = _cons(stem, i)
        if not c:
            started = True
        elif started and not prev_c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (_cons(word, len(word) - 3) and not _cons(word, len(word) - 2) and _cons(word, len(word) - 1)):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# METEOR
# ---------------------------------------------------------------------------

def _align(hyp: List[str], ref: List[str]):
    """Exact then stem matching, left-to-right; returns list of
    (hyp_idx, ref_idx) pairs."""
    pairs = []
    used_ref = [False] * len(ref)
    matched_hyp = [False] * len(hyp)
    # pass 1: exact
    for i, h in enumerate(hyp):
        for j, r in enumerate(ref):
            if not used_ref[j] and h == r:
                pairs.append((i, j))
                used_ref[j] = True
                matched_hyp[i] = True
                break
    # pass 2: stems
    hyp_stems = [porter_stem(h) for h in hyp]
    ref_stems = [porter_stem(r) for r in ref]
    for i, hs in enumerate(hyp_stems):
        if matched_hyp[i]:
            continue
        for j, rs in enumerate(ref_stems):
            if not used_ref[j] and hs == rs:
                pairs.append((i, j))
                used_ref[j] = True
                matched_hyp[i] = True
                break
    return sorted(pairs)


def _chunks(pairs) -> int:
    if not pairs:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(pairs, pairs[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def meteor_score(hyp_line: str, ref_line: str) -> float:
    hyp, ref = hyp_line.split(), ref_line.split()
    if not hyp or not ref:
        return 0.0
    pairs = _align(hyp, ref)
    m = len(pairs)
    if m == 0:
        return 0.0
    p = m / len(hyp)
    r = m / len(ref)
    f_mean = 10 * p * r / (r + 9 * p)
    penalty = 0.5 * (_chunks(pairs) / m) ** 3
    return f_mean * (1 - penalty)


class Meteor:
    def method(self):
        return "METEOR"

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        scores = []
        for k in gts:
            hyp = res[k][0]
            best = max((meteor_score(hyp, ref) for ref in gts[k]), default=0.0)
            scores.append(best)
        avg = sum(scores) / len(scores) if scores else 0.0
        return avg, scores
