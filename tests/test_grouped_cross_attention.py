"""Grouped shared-KV cross-attention == materialized per-event crop.

The flagship caption path cross-attends a per-video memory shared by G event
rows (groups=G) instead of materializing the reference's per-event zeroed
copies (unimodal_sparse_dvc.py:480-516). These tests pin the equivalence:

  * crop semantics: decoder outputs with groups=G on the shared memory match
    groups=1 on the materialized crop_segments output, with the crop mask;
  * bias-column path: when the attend mask unmasks tokens OUTSIDE the crop
    (the differentiable context mask, reference :246-267), those positions'
    k/v are the projection biases; the grouped path folds all m of them into
    one log(m)-weighted softmax column — exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.models.caption_decoder import (
    UnimodalCaptionDecoder,
    beam_search_decode,
    greedy_decode,
    make_causal_mask,
)
from multimodal_feature_learning_tpu.models.dvc import (
    crop_segment_mask,
    crop_segments,
)

B, G, S, D, V, L = 2, 3, 17, 32, 50, 7


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    module = UnimodalCaptionDecoder(
        vocab_size=V, seq_len=L, d_model=D, depth=2, num_heads=4,
        return_intermediate=True,
    )
    memory = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    # contiguous per-event windows like the real crop
    starts = rng.integers(0, S - 4, size=(B * G,))
    ends = starts + rng.integers(2, 5, size=(B * G,))
    toks = np.arange(S)[None]
    crop_mask = ~((toks >= starts[:, None]) & (toks < ends[:, None]))  # (N,S)
    crop_mask = jnp.asarray(crop_mask)
    tgt = jnp.asarray(rng.integers(0, V, size=(B * G, L - 1)).astype(np.int32))
    params = module.init(jax.random.PRNGKey(0), tgt, memory, groups=G)
    return module, params, memory, crop_mask, tgt


def materialized(memory, crop_mask):
    """Reference-style per-event crop: zero outside, (N, S, D)."""
    mem_rep = jnp.repeat(memory, G, axis=0)  # (N, S, D)
    return jnp.where(~crop_mask[..., None], mem_rep, 0.0)


def test_teacher_forced_grouped_matches_materialized(world):
    module, params, memory, crop_mask, tgt = world
    causal = make_causal_mask(L - 1)
    out_crop = module.apply(
        params, tgt, materialized(memory, crop_mask), causal, None, crop_mask
    )
    out_grouped = module.apply(
        params, tgt, memory, causal, None, crop_mask, groups=G
    )
    np.testing.assert_allclose(
        np.asarray(out_crop), np.asarray(out_grouped), rtol=2e-5, atol=2e-5
    )


def test_teacher_forced_bias_column_matches_materialized(world):
    """Attend mask unmasks out-of-crop (zeroed) positions: the grouped path's
    single log(m)-weighted bias column must equal m explicit zero-k/v rows."""
    module, params, memory, crop_mask, tgt = world
    rng = np.random.default_rng(1)
    # unmask a random subset of out-of-crop positions per row
    unmask = jnp.asarray(rng.random((B * G, S)) < 0.4) & crop_mask
    attend_mask = crop_mask & ~unmask  # True = masked
    causal = make_causal_mask(L - 1)
    out_crop = module.apply(
        params, tgt, materialized(memory, crop_mask), causal, None, attend_mask
    )
    out_grouped = module.apply(
        params, tgt, memory, causal, None, attend_mask, groups=G,
        zeroed_mask=crop_mask,
    )
    np.testing.assert_allclose(
        np.asarray(out_crop), np.asarray(out_grouped), rtol=2e-5, atol=2e-5
    )


def test_bias_column_applies_at_groups_one(world):
    """groups=1 with a zeroed_mask must NOT take the plain fast path: the
    bias-column crop semantics apply whenever zeroed_mask is given (e.g.
    max_gt_target_segments == 1 with the differentiable context mask)."""
    module, params, memory, crop_mask, tgt = world
    rng = np.random.default_rng(2)
    mem_rep = jnp.repeat(memory, G, axis=0)  # (N, S, D): N rows, groups=1
    zeroed = jnp.where(~crop_mask[..., None], mem_rep, 0.0)
    unmask = jnp.asarray(rng.random((B * G, S)) < 0.4) & crop_mask
    attend_mask = crop_mask & ~unmask
    causal = make_causal_mask(L - 1)
    out_crop = module.apply(params, tgt, zeroed, causal, None, attend_mask)
    out_g1 = module.apply(
        params, tgt, mem_rep, causal, None, attend_mask, groups=1,
        zeroed_mask=crop_mask,
    )
    np.testing.assert_allclose(
        np.asarray(out_crop), np.asarray(out_g1), rtol=2e-5, atol=2e-5
    )


def test_greedy_grouped_matches_materialized(world):
    module, params, memory, crop_mask, _ = world
    caps_crop = greedy_decode(
        module, params, materialized(memory, crop_mask), crop_mask,
        L, 2, 3, 1,
    )
    caps_grouped = greedy_decode(
        module, params, memory, crop_mask, L, 2, 3, 1, groups=G,
    )
    np.testing.assert_array_equal(np.asarray(caps_crop), np.asarray(caps_grouped))


def test_beam_grouped_matches_materialized(world):
    """Mirrors test_greedy_grouped_matches_materialized for beam search: the
    grouped path's contiguous n*K+k beam layout (groups_eff = groups*K) must
    produce the same best-beam captions as beam over the materialized crop."""
    module, params, memory, crop_mask, _ = world
    caps_crop = beam_search_decode(
        module, params, materialized(memory, crop_mask), crop_mask,
        L, 2, 3, 1, beam_size=3,
    )
    caps_grouped = beam_search_decode(
        module, params, memory, crop_mask, L, 2, 3, 1, beam_size=3, groups=G,
    )
    np.testing.assert_array_equal(np.asarray(caps_crop), np.asarray(caps_grouped))


def test_beam_grouped_bias_column_matches_materialized(world):
    """Beam + zeroed_mask: the zeroed_mask K-repeat and the bias-column crop
    semantics must survive the beam layout."""
    module, params, memory, crop_mask, _ = world
    rng = np.random.default_rng(3)
    unmask = jnp.asarray(rng.random((B * G, S)) < 0.4) & crop_mask
    attend_mask = crop_mask & ~unmask
    mem_rep = jnp.repeat(memory, G, axis=0)
    zeroed = jnp.where(~crop_mask[..., None], mem_rep, 0.0)
    caps_crop = beam_search_decode(
        module, params, zeroed, attend_mask, L, 2, 3, 1, beam_size=3,
        zeroed_mask=crop_mask,
    )
    caps_grouped = beam_search_decode(
        module, params, memory, attend_mask, L, 2, 3, 1, beam_size=3, groups=G,
        zeroed_mask=crop_mask,
    )
    np.testing.assert_array_equal(np.asarray(caps_crop), np.asarray(caps_grouped))


def test_crop_mask_matches_crop_segments_full_dims():
    """crop_segment_mask sized by the true pyramid length (563 for 300/4 —
    one past the reference's quirky last window bound of 562)."""
    rng = np.random.default_rng(2)
    durations = jnp.asarray(rng.uniform(20, 120, size=(2,)).astype(np.float32))
    segs = jnp.asarray(
        np.stack(
            [rng.uniform(0, 50, size=(2, 4)), rng.uniform(60, 110, size=(2, 4))],
            axis=-1,
        ).astype(np.float32)
    )
    memory = jnp.asarray(rng.normal(size=(2, 563, 8)).astype(np.float32))
    cropped, pad_mask = crop_segments(memory, segs, durations, 300, 4)
    mask = crop_segment_mask(segs, durations, 300, 4, num_tokens=563)
    np.testing.assert_array_equal(np.asarray(pad_mask), np.asarray(mask))
    assert mask.shape == (2, 4, 563)
    # the reference's level-3 upper-bound quirk: final token never inside
    assert bool(jnp.all(mask[..., -1]))
    # zeroing outside the mask reproduces the materialized crop
    np.testing.assert_array_equal(
        np.asarray(cropped),
        np.asarray(jnp.where(~mask[..., None], memory[:, None], 0.0)),
    )
