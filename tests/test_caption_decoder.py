"""Caption decoder: teacher-forcing shapes + KV-cached greedy decode parity.

The KV-cached scan must produce exactly the captions of the reference's
full-recompute greedy loop (unimodal_sparse_dvc.py:317-355), which we re-run
here via the module's own teacher-forcing `__call__`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.models.caption_decoder import (
    UnimodalCaptionDecoder,
    greedy_decode,
    make_causal_mask,
)

VOCAB, SEQ, D, DEPTH, HEADS = 50, 9, 32, 2, 4
PAD, BOS, EOS = 1, 2, 3


def build():
    module = UnimodalCaptionDecoder(
        vocab_size=VOCAB, seq_len=SEQ, d_model=D, depth=DEPTH, num_heads=HEADS,
        return_intermediate=True,
    )
    rng = jax.random.PRNGKey(0)
    N, S = 3, 15
    memory = jax.random.normal(jax.random.PRNGKey(1), (N, S, D))
    mem_mask = jnp.zeros((N, S), dtype=bool).at[:, 12:].set(True)
    tokens = jnp.full((N, SEQ), PAD, dtype=jnp.int32).at[:, 0].set(BOS)
    params = module.init(rng, tokens, memory)
    return module, params, memory, mem_mask


def test_teacher_forcing_shapes_and_logprobs():
    module, params, memory, mem_mask = build()
    N = memory.shape[0]
    tokens = jnp.full((N, SEQ - 1), PAD, dtype=jnp.int32).at[:, 0].set(BOS)
    out = module.apply(
        params, tokens, memory,
        tgt_mask=make_causal_mask(SEQ - 1),
        tgt_padding_mask=(tokens == PAD),
        memory_padding_mask=mem_mask,
    )
    assert out.shape == (DEPTH, N, SEQ - 1, VOCAB)
    # log-probs: logsumexp == 0
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(out, axis=-1)), 0.0, atol=1e-4
    )


def reference_greedy(module, params, memory, mem_mask, seq_len):
    """Full-recompute greedy loop — direct port of the reference semantics."""
    N = memory.shape[0]
    captions = np.full((N, seq_len), PAD, dtype=np.int32)
    captions[:, 0] = BOS
    done = np.zeros(N, dtype=bool)
    for t in range(1, seq_len):
        toks = jnp.asarray(captions)
        out = module.apply(
            params, toks, memory,
            tgt_mask=make_causal_mask(seq_len),
            tgt_padding_mask=(toks == PAD),
            memory_padding_mask=mem_mask,
        )
        pred = np.asarray(jnp.argmax(out[-1], axis=-1))  # (N, seq_len)
        for n in range(N):
            if not done[n]:
                captions[n, t] = pred[n, t]
                if pred[n, t] == EOS:
                    done[n] = True
    has_eos = (captions == EOS).any(axis=1)
    last = np.where(has_eos, PAD, EOS).astype(np.int32)
    return np.concatenate([captions, last[:, None]], axis=1)


def test_greedy_kv_cache_matches_full_recompute():
    module, params, memory, mem_mask = build()
    expected = reference_greedy(module, params, memory, mem_mask, SEQ)
    got = np.asarray(
        greedy_decode(module, params, memory, mem_mask, SEQ, BOS, EOS, PAD)
    )
    np.testing.assert_array_equal(got, expected)


def test_greedy_decode_jits():
    module, params, memory, mem_mask = build()
    f = jax.jit(
        lambda p, m, mm: greedy_decode(module, p, m, mm, SEQ, BOS, EOS, PAD)
    )
    out = f(params, memory, mem_mask)
    assert out.shape == (memory.shape[0], SEQ + 1)
