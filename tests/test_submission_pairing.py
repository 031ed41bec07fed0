"""Submission caption<->segment pairing order vs the reference.

The reference's get_src_permutation_idx (utils/preds_postprocess.py:16-29)
re-sorts the matched (src, tgt) pairs by TGT index before building the
caption-memory rows and the engine's submission pairing (engine.py:236-249).
Our eval path natively emits rows in GT-row (tgt) order (engine/evaluate.py),
and tools/quality_compare.py's torch bridge must iterate src the same way.
A stored-src-order iteration scrambles caption<->segment pairs and was worth
~0.8 METEOR points on the converged checkpoint (see QUALITY.md history).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_feature_learning_tpu.utils.ref_bridge import (  # noqa: E402
    make_reference_importable,
)


def test_src_permutation_is_tgt_sorted():
    make_reference_importable()
    from utils.preds_postprocess import get_src_permutation_idx  # reference

    rng = np.random.default_rng(0)
    indices = []
    for _ in range(4):
        n = int(rng.integers(1, 8))
        src = np.sort(rng.choice(50, size=n, replace=False))  # scipy: src asc
        tgt = rng.permutation(n)  # tgt arbitrary permutation
        indices.append(
            (torch.as_tensor(src, dtype=torch.int64),
             torch.as_tensor(tgt, dtype=torch.int64))
        )

    batch_idx, src_idx = get_src_permutation_idx(indices)

    # the bridge's reorder (quality_compare.py torch_submission) must
    # reproduce the reference's row order exactly
    ours = np.concatenate(
        [s.numpy()[np.argsort(t.numpy(), kind="stable")] for s, t in indices]
    )
    np.testing.assert_array_equal(src_idx.numpy(), ours)
    np.testing.assert_array_equal(
        batch_idx.numpy(),
        np.concatenate([np.full(len(s), b) for b, (s, _) in enumerate(indices)]),
    )
