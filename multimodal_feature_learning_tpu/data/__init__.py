from .vocab import Vocab, build_vocab, word_tokenize  # noqa: F401
from .anet import ActivityNetDataset, collate_fixed, build_dataset  # noqa: F401
