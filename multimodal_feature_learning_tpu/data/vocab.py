"""Vocabulary + tokenizer.

Behavioral spec: reference ``dataset/anet_video.py:387-401`` — torchtext vocab
over a Counter of lowercased tokenized train captions, ``min_freq=2``,
specials ``['<unk>', '<pad>', '<bos>', '<eos>']`` (indices 0..3), pickled.

The reference tokenizes with spacy's ``en_core_web_sm``; this framework uses a
self-contained regex tokenizer with the same practical behavior on caption
text (split words, split off punctuation, keep contractions as spacy does:
"don't" -> ["do", "n't"]).  Tokenization stays out of the jitted path.
"""

from __future__ import annotations

import pickle
import re
from collections import Counter
from typing import Dict, Iterable, List

_SPECIALS = ["<unk>", "<pad>", "<bos>", "<eos>"]

# contractions spacy splits as suffix tokens
_CONTRACTION = re.compile(r"(?i)(n't|'s|'re|'ve|'ll|'d|'m)$")
_TOKEN = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z0-9]+)*|[^\sA-Za-z0-9]")


def word_tokenize(text: str) -> List[str]:
    out: List[str] = []
    for tok in _TOKEN.findall(text):
        m = _CONTRACTION.search(tok)
        if m and m.start() > 0:
            out.append(tok[: m.start()])
            out.append(m.group(0))
        else:
            out.append(tok)
    return out


class Vocab:
    """Minimal torchtext-vocab-compatible mapping (stoi/itos, default <unk>)."""

    def __init__(self, itos: List[str]):
        self.itos = list(itos)
        self.stoi: Dict[str, int] = {w: i for i, w in enumerate(self.itos)}
        self.unk_idx = self.stoi["<unk>"]

    def __len__(self):
        return len(self.itos)

    def __getitem__(self, token: str) -> int:
        return self.stoi.get(token, self.unk_idx)

    def __contains__(self, token: str) -> bool:
        return token in self.stoi

    def get_itos(self) -> List[str]:
        return self.itos

    def lookup_tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.itos[i] for i in ids]

    @property
    def pad_idx(self):
        return self.stoi["<pad>"]

    @property
    def bos_idx(self):
        return self.stoi["<bos>"]

    @property
    def eos_idx(self):
        return self.stoi["<eos>"]

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.itos, f)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path, "rb") as f:
            return cls(pickle.load(f))


def build_vocab(annotations: Dict, min_freq: int = 2) -> Vocab:
    """annotations: {vid: {'sentences': [...]}} (train split)."""
    counter: Counter = Counter()
    for value in annotations.values():
        for caption in value["sentences"]:
            counter.update(word_tokenize(caption.lower()))
    # torchtext `vocab(ordered_dict, min_freq, specials)`: specials first,
    # then tokens in insertion (first-seen) order with freq >= min_freq.
    itos = list(_SPECIALS)
    for tok, freq in counter.items():
        if freq >= min_freq:
            itos.append(tok)
    return Vocab(itos)
