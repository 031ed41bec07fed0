"""Quantify tokenizer/vocab fidelity vs the reference pipeline.

The reference tokenizes captions with spacy en_core_web_sm (via torchtext
get_tokenizer, dataset/anet_video.py:434) and scores through the Java
PTBTokenizer. Neither spacy nor a JVM exists in this image, so this tool
measures divergence against a SIMULATOR of spacy's documented English
tokenizer algorithm (whitespace split -> special-case exceptions -> prefix/
suffix stripping -> infix splitting, per spacy's "How the tokenizer works"
and the en tokenizer_exceptions/punctuation rules). The simulator is
independent code from data/vocab.py's regex tokenizer — agreement between the
two bounds the caption-stream divergence from real spacy by construction on
caption-style text (plain words + sentence punctuation + contractions).

Measured on the real annotations (/root/reference/anet_data):
  1. %% of train/val_1 caption token streams identical (ours vs spacy-sim),
     and the same AFTER <unk>-mapping through the min_freq=2 vocab;
  2. vocab overlap: entries of the spacy-sim vocab missing from ours & v.v.;
  3. reference data-time lowercase quirk: the reference builds the vocab on
     caption.lower() but tokenizes RAW captions at data time
     (anet_video.py:188 vs :398), so capitalized surface forms fall to <unk>;
     we lowercase at data time (data/anet.py:138). This quantifies how many
     reference caption tokens hit <unk> because of case alone;
  4. score impact of the PTB-port-vs-split choice on a checked-in submission
     pair (quality_512): per-metric deltas when the evaluator tokenizes with
     evaluation/tokenizer.py's PTB port vs plain whitespace split.

Usage: python tools/tokenizer_fidelity.py [--out QUALITY_TOKENIZER.md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_feature_learning_tpu.data.vocab import build_vocab, word_tokenize

ANET = "/root/reference/anet_data"

# --------------------------------------------------------------------------
# spacy en tokenizer simulator (documented algorithm + English rules)
# --------------------------------------------------------------------------

# en tokenizer_exceptions relevant to caption text; spacy splits these as
# whole-substring special cases before punctuation rules
_SPECIAL = {
    "cannot": ["can", "not"], "gonna": ["gon", "na"], "gotta": ["got", "ta"],
    "wanna": ["wan", "na"], "lemme": ["lem", "me"], "gimme": ["gim", "me"],
    "outta": ["out", "ta"], "lotta": ["lot", "ta"], "lotsa": ["lots", "a"],
    "kinda": ["kind", "a"], "sorta": ["sort", "a"], "dunno": ["du", "nno"],
    "'cause": ["'cause"], "cant": ["ca", "nt"], "wont": ["wo", "nt"],
    "dont": ["do", "nt"], "doesnt": ["does", "nt"], "didnt": ["did", "nt"],
    "isnt": ["is", "nt"], "arent": ["are", "nt"], "wasnt": ["was", "nt"],
    "werent": ["were", "nt"], "havent": ["have", "nt"], "hasnt": ["has", "nt"],
    "hadnt": ["had", "nt"], "wouldnt": ["would", "nt"],
    "couldnt": ["could", "nt"], "shouldnt": ["should", "nt"],
}
# contraction suffixes: spacy's exceptions expand per-verb, net effect is a
# suffix split; n't attaches to the stem ("can't" -> ["ca","n't"])
_CONTR = re.compile(r"(?i)(n't|'s|'re|'ve|'ll|'d|'m)$")

_PREFIX = re.compile(r"""^[\(\)\[\]\{\}<>"'`«»„“”‘’,:;!?\.\$£€#%&\*\+\-/=@~…]""")
_SUFFIX = re.compile(r"""[\(\)\[\]\{\}<>"'`«»„“”‘’,:;!?\.\$£€#%&\*\+/=@~…]$""")
# en infixes on caption text: hyphen/slash between alphanumerics, ellipsis,
# comma/period between letters without space
_INFIX = re.compile(
    r"(?<=[A-Za-z0-9])([\-–—~/])(?=[A-Za-z0-9])"
    r"|(?<=[A-Za-z])([,;:\.])(?=[A-Za-z])"
)


def spacy_sim(text: str):
    out = []
    for sub in text.split():
        pending = []  # suffix chars popped innermost-last (emit reversed)
        while sub:
            low = sub.lower()
            if low in _SPECIAL:
                # casing preserved only for all-lower input (caption vocab
                # path lowercases first, so this is exact there)
                out.extend(_SPECIAL[low] if sub == low else [sub])
                break
            m = _PREFIX.match(sub)
            if m:
                out.append(m.group(0))
                sub = sub[m.end():]
                continue
            m = _SUFFIX.search(sub)
            if m and len(sub) > 1:
                # strip ONE suffix char and re-enter the loop (spacy pops
                # suffixes one rule application at a time — "dog.." ->
                # ["dog", ".", "."]); emit after the remainder
                pending.append(sub[m.start():])
                sub = sub[: m.start()]
                continue
            out.extend(_tok_core(sub))
            break
        out.extend(reversed(pending))
    return [t for t in out if t]


def _tok_core(sub: str):
    """No leading/trailing punct: special cases, contractions, infixes."""
    low = sub.lower()
    if low in _SPECIAL and sub == low:
        return list(_SPECIAL[low])
    m = _CONTR.search(sub)
    if m and m.start() > 0:
        return _tok_core(sub[: m.start()]) + [m.group(0)]
    parts, last = [], 0
    for m in _INFIX.finditer(sub):
        parts.append(sub[last : m.start(1) if m.group(1) else m.start(2)])
        parts.append(m.group(1) or m.group(2))
        last = m.end(1) if m.group(1) else m.end(2)
    parts.append(sub[last:])
    return [p for p in parts if p]


# --------------------------------------------------------------------------


def caption_iter(path):
    with open(path) as f:
        ann = json.load(f)
    for vid, entry in ann.items():
        for s in entry["sentences"]:
            yield s


def stream_stats(sentences, vocab):
    total = ident = 0
    ident_ids = 0
    tok_ours = tok_sim = 0
    for s in sentences:
        s = s.strip()
        ours = word_tokenize(s.lower())
        sim = spacy_sim(s.lower())
        total += 1
        tok_ours += len(ours)
        tok_sim += len(sim)
        if ours == sim:
            ident += 1
            ident_ids += 1
        else:
            if [vocab[t] for t in ours] == [vocab[t] for t in sim]:
                ident_ids += 1
    return dict(total=total, identical=ident, identical_after_vocab=ident_ids,
                tokens_ours=tok_ours, tokens_sim=tok_sim)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_TOKENIZER.md")
    args = ap.parse_args()

    with open(os.path.join(ANET, "train.json")) as f:
        train_ann = json.load(f)
    train_sents = [s for e in train_ann.values() for s in e["sentences"]]
    val_sents = list(caption_iter(os.path.join(ANET, "val_1.json")))

    # vocabs under each tokenizer
    vocab_ours = build_vocab(train_ann, min_freq=2)
    counter = Counter()
    for s in train_sents:
        counter.update(spacy_sim(s.lower()))
    itos_sim = ["<unk>", "<pad>", "<bos>", "<eos>"] + sorted(
        [w for w, c in counter.items() if c >= 2]
    )
    set_ours, set_sim = set(vocab_ours.itos), set(itos_sim)
    only_ours = sorted(set_ours - set_sim)
    only_sim = sorted(set_sim - set_ours)

    st_train = stream_stats(train_sents, vocab_ours)
    st_val = stream_stats(val_sents, vocab_ours)

    # reference data-time case quirk: raw tokens vs lowercased vocab
    raw_unk = low_unk = raw_total = 0
    for s in train_sents[:20000]:
        raw = word_tokenize(s.strip())
        raw_total += len(raw)
        raw_unk += sum(1 for t in raw if t not in vocab_ours.stoi)
        low_unk += sum(1 for t in word_tokenize(s.strip().lower())
                       if t not in vocab_ours.stoi)

    # PTB-port score impact on the checked-in 512-video submission pair
    score_rows = []
    try:
        from multimodal_feature_learning_tpu.evaluation.anet_eval import ANETCaptionsEvaluator  # noqa: F401
        from multimodal_feature_learning_tpu.evaluation.tokenizer import ptb_tokenize_line
        from multimodal_feature_learning_tpu.evaluation.metrics import (
            Bleu, Cider, Meteor, Rouge,
        )

        def score_pair(sub_path, tok):
            with open(sub_path) as f:
                sub = json.load(f)
            with open(os.path.join(ANET, "val_1.json")) as f:
                gt = json.load(f)
            # flatten: every predicted event scored vs the video's sentences
            gts, res = {}, {}
            i = 0
            for vid, events in sub["results"].items():
                if vid not in gt:
                    continue
                refs = [tok(s.strip().lower()) for s in gt[vid]["sentences"]]
                for ev in events:
                    gts[i] = refs
                    res[i] = [tok(ev["sentence"].strip().lower())]
                    i += 1
            out = {}
            for scorer, name in [(Bleu(4), "Bleu"), (Meteor(), "METEOR"),
                                 (Rouge(), "ROUGE_L"), (Cider(), "CIDEr")]:
                s, _ = scorer.compute_score(gts, res)
                if name == "Bleu":
                    for k in range(4):
                        out[f"Bleu_{k+1}"] = s[k]
                else:
                    out[name] = s
            return out

        def tok_ptb(line):
            return " ".join(ptb_tokenize_line(line))

        def tok_split(line):
            return " ".join(line.split())

        for name, path in [("ours", "quality_512_sub_ours.json"),
                           ("reference", "quality_512_sub_ref.json")]:
            if not os.path.exists(path):
                continue
            with_ptb = score_pair(path, tok_ptb)
            with_split = score_pair(path, tok_split)
            for metric in with_ptb:
                score_rows.append(
                    (name, metric, with_ptb[metric], with_split[metric])
                )
    except Exception as e:  # pragma: no cover
        print(f"score-impact section skipped: {e}", file=sys.stderr)

    lines = []
    lines.append("# Tokenizer / vocabulary fidelity\n")
    lines.append(
        "Reference: spacy en_core_web_sm via torchtext "
        "(dataset/anet_video.py:434); ours: regex tokenizer "
        "(data/vocab.py). Neither spacy nor torchtext is installed in this "
        "image, so divergence is measured against an independent simulator "
        "of spacy's documented English rules (tools/tokenizer_fidelity.py); "
        "agreement between two independent implementations bounds the real "
        "divergence on caption-style text.\n"
    )
    lines.append("## Caption token-stream agreement (lowercased, as the vocab path)\n")
    lines.append("| split | captions | identical streams | identical after vocab ids | tokens ours | tokens spacy-sim |")
    lines.append("|---|---|---|---|---|---|")
    for name, st in [("train", st_train), ("val_1", st_val)]:
        lines.append(
            f"| {name} | {st['total']} | {st['identical']} "
            f"({100*st['identical']/st['total']:.3f}%) | "
            f"{st['identical_after_vocab']} "
            f"({100*st['identical_after_vocab']/st['total']:.3f}%) | "
            f"{st['tokens_ours']} | {st['tokens_sim']} |"
        )
    lines.append("")
    lines.append("## Vocabulary overlap (min_freq=2 on train.json)\n")
    lines.append(f"- ours: {len(set_ours)} entries; spacy-sim: {len(set_sim)} entries")
    lines.append(f"- shared: {len(set_ours & set_sim)}")
    lines.append(f"- only ours ({len(only_ours)}): {only_ours[:25]}")
    lines.append(f"- only spacy-sim ({len(only_sim)}): {only_sim[:25]}")
    lines.append("")
    lines.append("## Reference data-time lowercase quirk\n")
    lines.append(
        "The reference builds its vocab from `caption.lower()` "
        "(anet_video.py:398) but tokenizes RAW captions at data time "
        "(anet_video.py:188), so case-carrying surface forms map to <unk>. "
        "On the first 20k train captions:\n"
    )
    lines.append(f"- raw-case tokens hitting <unk>: {raw_unk}/{raw_total} "
                 f"({100*raw_unk/max(raw_total,1):.2f}%) — the reference's effective rate")
    lines.append(f"- lowercased tokens hitting <unk>: {low_unk}/{raw_total} "
                 f"({100*low_unk/max(raw_total,1):.2f}%) — our rate "
                 "(we lowercase at data time, data/anet.py:138)")
    lines.append("")
    if score_rows:
        lines.append("## PTB-port vs whitespace-split score impact (quality_512 submissions)\n")
        lines.append("| submission | metric | PTB port | plain split | delta |")
        lines.append("|---|---|---|---|---|")
        for name, metric, a, b in score_rows:
            lines.append(f"| {name} | {metric} | {a:.4f} | {b:.4f} | {a-b:+.4f} |")
        lines.append("")

    text = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
