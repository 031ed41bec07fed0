"""Per-event autoregressive caption decoder.

Behavioral spec: reference ``models/unimodal_caption_decoder.py:19-144``
(token embed -> sinusoidal PE -> depth x post-norm decoder layers -> Linear
head -> softmax, per-layer intermediates stacked) and the greedy eval loop in
``models/sparse/unimodal_sparse_dvc.py:303-355`` (argmax per step, per-caption
freeze after <eos>, final <eos>/<pad> append).

TPU-native deltas:
  * ``__call__`` returns LOG-probabilities (log_softmax) rather than the
    reference's softmax-then-log — numerically identical in exact arithmetic,
    strictly more stable; the criterion consumes log-probs directly.
  * greedy decode is a ``lax.scan`` with true per-layer KV caches instead of
    the reference's full decoder re-run per word: the memory cross-attn k/v are
    projected once and each step touches exactly one position.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .embeddings import VocabularyEmbedder, caption_positional_encoding
from .layers import UnimodalCaptionDecoderLayer


def make_causal_mask(seq_len: int) -> jnp.ndarray:
    """(seq_len, seq_len) True above the diagonal (masked); reference
    unimodal_sparse_dvc.py:410-426."""
    return ~jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))


class UnimodalCaptionDecoder(nn.Module):
    vocab_size: int
    seq_len: int = 20
    d_model: int = 512
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    positional_embedding_dropout: float = 0.0
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0
    pre_norm: bool = False
    return_intermediate: bool = True
    pretrained_matrix: Optional[np.ndarray] = None

    def setup(self):
        self.target_embedding = VocabularyEmbedder(
            self.vocab_size, self.d_model, self.pretrained_matrix
        )
        self.pos_table = caption_positional_encoding(self.d_model)
        self.pos_dropout = nn.Dropout(self.positional_embedding_dropout)
        self.decoder = [
            UnimodalCaptionDecoderLayer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                attention_dropout=self.attention_dropout,
                projection_dropout=self.projection_dropout,
                mlp_dropout_1=self.mlp_dropout_1,
                mlp_dropout_2=self.mlp_dropout_2,
                pre_norm=self.pre_norm,
            )
            for _ in range(self.depth)
        ]
        self.head = nn.Dense(self.vocab_size)

    def embed(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(N, Tc) int tokens -> (N, Tc, D) with sinusoidal PE."""
        x = self.target_embedding(tokens)
        # f32 sine table cast to the embedding dtype so a bf16 trunk stays bf16
        x = x + self.pos_table[:, : x.shape[1], :].astype(x.dtype)
        return self.pos_dropout(x, deterministic=deterministic)

    def embed_at(self, tokens: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """(N,) tokens at dynamic position pos -> (N, 1, D).

        pos: scalar (lockstep batch decode) or (N,) per-row positions
        (continuous-batching serve path)."""
        x = self.target_embedding(tokens[:, None])
        if jnp.ndim(pos) == 1:
            pe = self.pos_table[0, pos][:, None, :]  # (N, 1, D)
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pos_table, pos, 1, axis=1)
        return x + pe.astype(x.dtype)

    def __call__(
        self,
        tgt: jnp.ndarray,            # (N, Tc) token ids
        memory: jnp.ndarray,         # (N, S, D), or (B, S, D) with groups = N // B
        tgt_mask=None,               # (Tc, Tc) True=masked (causal)
        tgt_padding_mask=None,       # (N, Tc) True=pad
        memory_padding_mask=None,    # (N, S) True=pad
        deterministic: bool = True,
        groups: int = 1,
        zeroed_mask=None,            # (N, S): crop mask when it differs from
                                     # memory_padding_mask (shared-KV path)
        return_logits: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced pass -> (depth, N, Tc, vocab) log-probabilities.

        ``return_logits=True`` skips the log_softmax and returns the raw
        logits in compute dtype — the train path pairs this with the
        criterion's fused ``label_smoothing_kl_logits``, which upcasts to f32
        inside its reductions, so neither a V-sized log-prob tensor nor a
        materialized f32 copy of the logits is stored for the backward pass
        (argmax/loss semantics unchanged)."""
        x = self.embed(tgt, deterministic)
        if tgt_mask is not None and tgt_mask.ndim == 2:
            tgt_mask = tgt_mask[None, None]  # (1, 1, Tc, Tc)
        intermediate = []
        for layer in self.decoder:
            x = layer(
                x, memory, tgt_mask, tgt_padding_mask, memory_padding_mask,
                deterministic=deterministic, groups=groups,
                zeroed_mask=zeroed_mask,
            )
            if self.return_intermediate:
                intermediate.append(x)
        stacked = jnp.stack(intermediate) if self.return_intermediate else x[None]
        # vocab head matmul in compute dtype; log_softmax and the KL loss that
        # consumes it always in f32 (the fused train loss upcasts internally)
        if return_logits:
            return self.head(stacked)
        return nn.log_softmax(self.head(stacked).astype(jnp.float32), axis=-1)

    # -- incremental decode pieces -------------------------------------------

    def precompute_memory_kv(self, memory: jnp.ndarray):
        """Per-layer cross-attn (k, v) of the memory; computed once per decode."""
        return [layer.project_memory_kv(memory) for layer in self.decoder]

    def decode_step(
        self,
        tokens: jnp.ndarray,      # (N,) token at position `step`
        step: jnp.ndarray,        # scalar position index
        valid_len: jnp.ndarray,   # attendable prefix length
        k_caches: jnp.ndarray,    # (depth, N, Tc, D)
        v_caches: jnp.ndarray,    # (depth, N, Tc, D)
        mem_kv,                   # list of (k, v) from precompute_memory_kv
        memory_padding_mask,      # (N, S)
        write_self: bool,
        groups: int = 1,
        zeroed_mask=None,
    ):
        """Run one position through all layers. Returns (logits, k_caches, v_caches)."""
        x = self.embed_at(tokens, step)
        new_k, new_v = [], []
        for li, layer in enumerate(self.decoder):
            mk, mv = mem_kv[li]
            x, kc, vc = layer.incremental(
                x, step, k_caches[li], v_caches[li], valid_len,
                mk, mv, memory_padding_mask, write_self, groups=groups,
                zeroed_mask=zeroed_mask,
            )
            new_k.append(kc)
            new_v.append(vc)
        # f32 logits: argmax/beam scoring precision independent of trunk dtype
        logits = self.head(x[:, 0, :]).astype(jnp.float32)  # (N, vocab)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    def decode_pair(
        self,
        prev_tokens: jnp.ndarray,  # (N,) committed token at position step
        pad_tokens: jnp.ndarray,   # (N,) pad query at position step+1
        step: jnp.ndarray,         # position of prev_tokens
        k_caches: jnp.ndarray,     # (depth, N, Tc, D)
        v_caches: jnp.ndarray,
        mem_kv,
        memory_padding_mask,
        groups: int = 1,
        zeroed_mask=None,
    ):
        """Fused commit(step)+predict(step+1) through all layers; returns
        (logits at step+1, updated caches). Math-identical to two decode_step
        calls at half the memory traffic."""
        x_prev = self.embed_at(prev_tokens, step)
        x_next = self.embed_at(pad_tokens, step + 1)
        x = jnp.concatenate([x_prev, x_next], axis=1)  # (N, 2, D)
        new_k, new_v = [], []
        for li, layer in enumerate(self.decoder):
            mk, mv = mem_kv[li]
            x, kc, vc = layer.incremental_pair(
                x, step, k_caches[li], v_caches[li], step + 1,
                mk, mv, memory_padding_mask, groups=groups,
                zeroed_mask=zeroed_mask,
            )
            new_k.append(kc)
            new_v.append(vc)
        logits = self.head(x[:, 1, :]).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


def greedy_decode(
    module: UnimodalCaptionDecoder,
    params,
    memory: jnp.ndarray,          # (N, S, D); or (B, S, D) with groups = N // B
    memory_padding_mask,          # (N, S) True=pad
    seq_len: int,
    bos_idx: int,
    eos_idx: int,
    pad_idx: int,
    faster_eval: bool = False,
    kv_dtype=None,
    groups: int = 1,
    zeroed_mask=None,
    decode_impl: str = "xla",     # "xla" | "fused" (Pallas decode-step kernel)
    kv_mode: str = "dense",       # "dense" | "int8" (fused path only)
    fused_grid: str = "video",    # "video" | "batch" (ops/fused_decode.py)
    fused_interpret: bool = False,
):
    """KV-cached greedy decode; semantics of the reference eval loop
    (unimodal_sparse_dvc.py:303-355): argmax per step; with
    ``faster_eval=False`` captions freeze after <eos> and a trailing
    <pad>/<eos> is appended; with ``faster_eval=True`` every position takes
    the raw argmax and an <eos> column is appended unconditionally
    (reference :334-335, :348-351).

    Returns (N, seq_len + 1) int32 captions including the trailing token.

    With ``groups > 1`` the memory is per-video (B, S, D) shared by `groups`
    consecutive rows (the per-event crop mask lives in memory_padding_mask);
    cross-attn K/V are then read once per video per step instead of once per
    event — ~groups× less HBM traffic on the decode's dominant stream.
    """
    if decode_impl == "fused":
        if groups <= 1:
            raise ValueError("fused decode requires the grouped shared-KV path")
        return _greedy_decode_fused(
            module, params, memory, memory_padding_mask, seq_len,
            bos_idx, eos_idx, pad_idx, faster_eval=faster_eval,
            groups=groups, zeroed_mask=zeroed_mask, kv_mode=kv_mode,
            kv_dtype=kv_dtype, grid_mode=fused_grid,
            interpret=fused_interpret,
        )

    N = memory.shape[0] * groups
    S, D = memory.shape[1], memory.shape[2]
    depth = module.depth

    mem_kv = module.apply(params, memory, method=UnimodalCaptionDecoder.precompute_memory_kv)
    if kv_dtype is not None:
        # bandwidth knob: the memory k/v are re-read every decode step and
        # dominate HBM traffic; attention logits still accumulate in f32
        mem_kv = jax.tree.map(lambda a: a.astype(kv_dtype), mem_kv)

    captions = jnp.full((N, seq_len), pad_idx, dtype=jnp.int32)
    captions = captions.at[:, 0].set(bos_idx)
    done = jnp.zeros((N,), dtype=bool)
    k_caches = jnp.zeros((depth, N, seq_len, D), dtype=memory.dtype)
    v_caches = jnp.zeros((depth, N, seq_len, D), dtype=memory.dtype)

    def step_body(carry):
        t, captions, done, k_caches, v_caches = carry
        # fused: commit token t-1 + predict token t in a single layer pass
        prev_tok = jnp.take_along_axis(captions, (t - 1)[None, None].repeat(N, 0), axis=1)[:, 0]
        pad_tok = jnp.full((N,), pad_idx, dtype=jnp.int32)
        logits, k_caches, v_caches = module.apply(
            params, prev_tok, pad_tok, t - 1, k_caches, v_caches, mem_kv,
            memory_padding_mask, groups, zeroed_mask,
            method=UnimodalCaptionDecoder.decode_pair,
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not faster_eval:
            tok = jnp.where(done, pad_idx, tok)
        captions = captions.at[:, t].set(tok)
        done = done | (tok == eos_idx)
        return (t + 1, captions, done, k_caches, v_caches)

    if faster_eval:
        # faster_eval fills EVERY slot (reference :334-335) so there is no
        # early exit to take — the flag is SEMANTIC (raw argmax everywhere),
        # not a speedup here (greedy's all-done early exit usually wins; see
        # README "faster_eval" note). A static-trip lax.scan lets XLA drop
        # the per-step dynamic cond check and the dead done bookkeeping.
        def scan_step(carry, t):
            captions, k_caches, v_caches = carry
            prev_tok = jnp.take_along_axis(
                captions, (t - 1)[None, None].repeat(N, 0), axis=1)[:, 0]
            pad_tok = jnp.full((N,), pad_idx, dtype=jnp.int32)
            logits, k_caches, v_caches = module.apply(
                params, prev_tok, pad_tok, t - 1, k_caches, v_caches, mem_kv,
                memory_padding_mask, groups, zeroed_mask,
                method=UnimodalCaptionDecoder.decode_pair,
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            captions = captions.at[:, t].set(tok)
            return (captions, k_caches, v_caches), None

        (captions, _, _), _ = jax.lax.scan(
            scan_step, (captions, k_caches, v_caches),
            jnp.arange(1, seq_len, dtype=jnp.int32))
    else:
        def step_cond(carry):
            # early exit once every caption has emitted <eos> — the
            # reference's "if total_caption_done == total_caption_num: break"
            # (unimodal_sparse_dvc.py:345-346); token-identical because
            # frozen captions only ever append <pad>.
            t, captions, done, *_ = carry
            return (t < seq_len) & ~jnp.all(done)

        _, captions, done, _, _ = jax.lax.while_loop(
            step_cond, step_body,
            (jnp.int32(1), captions, done, k_caches, v_caches),
        )

    if faster_eval:
        last = jnp.full((N,), eos_idx, dtype=jnp.int32)
    else:
        has_eos = jnp.any(captions == eos_idx, axis=1)
        last = jnp.where(has_eos, pad_idx, eos_idx).astype(jnp.int32)
    return jnp.concatenate([captions, last[:, None]], axis=1)


def greedy_decode_chunk(
    module: UnimodalCaptionDecoder,
    params,
    captions: jnp.ndarray,        # (N, seq_len) int32, position 0 = <bos>
    done: jnp.ndarray,            # (N,) bool — row emitted <eos>
    t_vid: jnp.ndarray,           # (B,) int32 — next position to fill, per video
    k_caches: jnp.ndarray,        # (depth, N, seq_len, D)
    v_caches: jnp.ndarray,
    mem_kv,                       # list of (k, v) from precompute_memory_kv
    memory_padding_mask,          # (N, Sp)
    seq_len: int,
    eos_idx: int,
    pad_idx: int,
    groups: int,
    zeroed_mask,
    active_vid: jnp.ndarray,      # (B,) bool — slot holds a live request
    chunk: int,
):
    """Advance each video's greedy decode by up to ``chunk`` positions at
    PER-VIDEO cursors ``t_vid`` — the continuous-batching serve step: slots
    at different decode depths run in the same dispatch, so a finished slot
    can be harvested and refilled between chunks instead of holding the whole
    batch through the longest caption (VERDICT r3 item 5).

    Token semantics are identical to `greedy_decode` (argmax; done rows
    append <pad>; a video freezes when all its `groups` rows are done or its
    cursor reaches seq_len). Frozen videos still flow through the layer pass
    (static shapes) but their state is fixpoint: the cache commit rewrites
    the same values at the same position and caption/done/t updates are
    gated, so re-running them is a no-op.

    Returns (captions, done, t_vid, k_caches, v_caches).
    """
    B = t_vid.shape[0]
    N = captions.shape[0]
    G = groups
    rows = jnp.arange(N)

    def step_fn(carry, _):
        captions, done, t_vid, k_caches, v_caches = carry
        vid_done = jnp.all(done.reshape(B, G), axis=1)
        adv_vid = active_vid & (t_vid < seq_len) & ~vid_done
        t_row = jnp.repeat(t_vid, G)
        adv_row = jnp.repeat(adv_vid, G)
        t_w = jnp.clip(t_row, 1, seq_len - 1)
        prev_tok = captions[rows, t_w - 1]
        pad_tok = jnp.full((N,), pad_idx, dtype=jnp.int32)
        logits, k_caches, v_caches = module.apply(
            params, prev_tok, pad_tok, t_w - 1, k_caches, v_caches, mem_kv,
            memory_padding_mask, G, zeroed_mask,
            method=UnimodalCaptionDecoder.decode_pair,
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(done, pad_idx, tok)
        captions = captions.at[rows, t_w].set(
            jnp.where(adv_row, tok, captions[rows, t_w]))
        done = done | ((tok == eos_idx) & adv_row)
        t_vid = t_vid + adv_vid.astype(t_vid.dtype)
        return (captions, done, t_vid, k_caches, v_caches), None

    carry, _ = jax.lax.scan(
        step_fn, (captions, done, t_vid, k_caches, v_caches),
        None, length=chunk)
    return carry


def _greedy_decode_fused(
    module: UnimodalCaptionDecoder,
    params,
    memory: jnp.ndarray,          # (B, S, D) shared per-video memory
    memory_padding_mask,          # (N, S) True=pad (per event)
    seq_len: int,
    bos_idx: int,
    eos_idx: int,
    pad_idx: int,
    faster_eval: bool = False,
    groups: int = 1,
    zeroed_mask=None,
    kv_mode: str = "dense",
    kv_dtype=None,
    grid_mode: str = "video",
    interpret: bool = False,
):
    """Greedy decode through the fused Pallas decode-step kernel.

    Same loop semantics (argmax, per-caption <eos> freeze, early-exit
    while_loop, tail token) as `greedy_decode`; each step runs all decoder
    layers in ONE `pallas_call` (ops/fused_decode.py) instead of ~40 XLA
    kernels, streaming the cross-attn K/V once per (layer, video) with the
    attention probabilities never leaving VMEM.  `kv_mode='int8'` also
    quantizes the cross-attn K/V per token (flag-gated; VERDICT r3 item 2).
    """
    from ..ops.fused_decode import (
        extract_decoder_weights, fused_decode_step, quantize_kv_int8,
        stack_memory_kv,
    )

    B, S, D = memory.shape
    G = groups
    N = B * G
    R = 2 * G
    Tc = seq_len
    depth = module.depth
    ct = memory.dtype
    Sp = ((S + 127) // 128) * 128

    weights = extract_decoder_weights(params)
    mem_k, mem_v = stack_memory_kv(weights, memory, Sp)
    if kv_dtype is not None:
        mem_k, mem_v = mem_k.astype(kv_dtype), mem_v.astype(kv_dtype)
    k_scales = v_scales = None
    if kv_mode == "int8":
        mem_k, k_scales = quantize_kv_int8(mem_k)
        mem_v, v_scales = quantize_kv_int8(mem_v)

    # masks, t-major rows (row r of a video = event r % G), S padded blocked
    pad = memory_padding_mask.reshape(B, G, S)
    has_bias = zeroed_mask is not None
    if has_bias:
        zer = zeroed_mask.reshape(B, G, S)
        shared_block = pad | zer
        m = jnp.sum(~pad & zer, axis=2).astype(jnp.float32)  # (B, G)
        log_m = jnp.where(m > 0, jnp.log(jnp.maximum(m, 1.0)), -1e20)
    else:
        shared_block = pad
        log_m = jnp.zeros((B, G), jnp.float32)
    mask_i8 = jnp.pad(
        shared_block, ((0, 0), (0, 0), (0, Sp - S)), constant_values=True
    ).astype(jnp.int8)
    mask_i8 = jnp.tile(mask_i8, (1, 2, 1))          # (B, R, Sp)
    log_m = jnp.tile(log_m, (1, 2))[..., None]       # (B, R, 1)

    head_k = params["params"]["head"]["kernel"]
    head_b = params["params"]["head"]["bias"]

    captions = jnp.full((N, seq_len), pad_idx, dtype=jnp.int32)
    captions = captions.at[:, 0].set(bos_idx)
    done = jnp.zeros((N,), dtype=bool)
    k_caches = jnp.zeros((depth, B, Tc * G, D), dtype=ct)
    v_caches = jnp.zeros((depth, B, Tc * G, D), dtype=ct)
    pad_tok = jnp.full((N,), pad_idx, dtype=jnp.int32)

    def step_body(carry):
        t, captions, done, k_caches, v_caches = carry
        prev_tok = jnp.take_along_axis(
            captions, (t - 1)[None, None].repeat(N, 0), axis=1
        )[:, 0]
        x_prev = module.apply(
            params, prev_tok, t - 1, method=UnimodalCaptionDecoder.embed_at
        )  # (N, 1, D)
        x_next = module.apply(
            params, pad_tok, t, method=UnimodalCaptionDecoder.embed_at
        )
        x = jnp.concatenate(
            [x_prev[:, 0].reshape(B, G, D), x_next[:, 0].reshape(B, G, D)],
            axis=1,
        )  # (B, R, D) t-major rows
        x_out, k_caches, v_caches = fused_decode_step(
            x, k_caches, v_caches, t - 1, t,
            mem_k, mem_v, k_scales, v_scales, mask_i8, log_m, weights,
            G=G, num_heads=module.num_heads, has_bias_col=has_bias,
            grid_mode=grid_mode, interpret=interpret,
        )
        x_pred = x_out[:, G:, :].reshape(N, D)  # predict rows, event-major
        logits = (x_pred @ head_k + head_b).astype(jnp.float32)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not faster_eval:
            tok = jnp.where(done, pad_idx, tok)
        captions = captions.at[:, t].set(tok)
        done = done | (tok == eos_idx)
        return (t + 1, captions, done, k_caches, v_caches)

    def step_cond(carry):
        t, captions, done, *_ = carry
        if faster_eval:
            return t < seq_len
        return (t < seq_len) & ~jnp.all(done)

    _, captions, done, _, _ = jax.lax.while_loop(
        step_cond, step_body,
        (jnp.int32(1), captions, done, k_caches, v_caches),
    )

    if faster_eval:
        last = jnp.full((N,), eos_idx, dtype=jnp.int32)
    else:
        has_eos = jnp.any(captions == eos_idx, axis=1)
        last = jnp.where(has_eos, pad_idx, eos_idx).astype(jnp.int32)
    return jnp.concatenate([captions, last[:, None]], axis=1)


def beam_search_decode(
    module: UnimodalCaptionDecoder,
    params,
    memory: jnp.ndarray,          # (N, S, D); or (B, S, D) with groups = N // B
    memory_padding_mask,          # (N, S) True=pad
    seq_len: int,
    bos_idx: int,
    eos_idx: int,
    pad_idx: int,
    beam_size: int = 4,
    length_penalty: float = 0.0,
    groups: int = 1,
    zeroed_mask=None,
):
    """Batched beam search with per-layer KV caches, fully inside jit.

    The reference has no beam search (greedy only); this is the TPU-native
    extension called out by the driver's config #5 ("beam-search decode").
    Candidate expansion is a single top-k over (beam * vocab) per sample, and
    beam reordering is a cache gather — no host control flow.

    Returns (N, seq_len + 1) captions of the best beam, same tail convention
    as greedy_decode.
    """
    N = memory.shape[0] * groups
    S, D = memory.shape[1], memory.shape[2]
    depth, K = module.depth, beam_size
    NEG = jnp.float32(-1e9)

    # beams of one row are contiguous (row n -> n*K + k), so grouped memory
    # stays per-video with group size groups*K; ungrouped memory is expanded.
    mem_mask = jnp.repeat(memory_padding_mask, K, axis=0)  # (N*K, S)
    mem = memory if groups > 1 else jnp.repeat(memory, K, axis=0)
    groups_eff = groups * K if groups > 1 else 1
    zeroed_eff = (
        jnp.repeat(zeroed_mask, K, axis=0) if zeroed_mask is not None else None
    )
    mem_kv = module.apply(params, mem, method=UnimodalCaptionDecoder.precompute_memory_kv)

    tokens = jnp.full((N, K, seq_len), pad_idx, dtype=jnp.int32).at[:, :, 0].set(bos_idx)
    # only beam 0 live at the start so the first expansion diversifies
    scores = jnp.where(jnp.arange(K)[None] == 0, 0.0, NEG) * jnp.ones((N, 1))
    done = jnp.zeros((N, K), dtype=bool)
    k_caches = jnp.zeros((depth, N * K, seq_len, D), dtype=memory.dtype)
    v_caches = jnp.zeros((depth, N * K, seq_len, D), dtype=memory.dtype)

    def step_fn(carry):
        t, tokens, scores, done, k_caches, v_caches = carry
        flat_prev = tokens[:, :, :].reshape(N * K, seq_len)
        prev_tok = jnp.take_along_axis(
            flat_prev, (t - 1)[None, None].repeat(N * K, 0), axis=1
        )[:, 0]
        # commit previous token into the caches
        _, k_caches, v_caches = module.apply(
            params, prev_tok, t - 1, t, k_caches, v_caches, mem_kv, mem_mask,
            True, groups_eff, zeroed_eff,
            method=UnimodalCaptionDecoder.decode_step,
        )
        # predict position t
        pad_tok = jnp.full((N * K,), pad_idx, dtype=jnp.int32)
        logits, _, _ = module.apply(
            params, pad_tok, t, t, k_caches, v_caches, mem_kv, mem_mask,
            False, groups_eff, zeroed_eff,
            method=UnimodalCaptionDecoder.decode_step,
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(N, K, -1)  # (N, K, V)
        V = logp.shape[-1]
        # finished beams only extend with <pad> at zero cost
        pad_only = jnp.full((V,), NEG).at[pad_idx].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None], logp)

        cand = (scores[..., None] + logp).reshape(N, K * V)
        new_scores, idx = jax.lax.top_k(cand, K)  # (N, K)
        parent = idx // V  # (N, K)
        new_tok = (idx % V).astype(jnp.int32)

        # reorder everything by parent beam
        rowsN = jnp.arange(N)[:, None]
        tokens = tokens[rowsN, parent]  # (N, K, T)
        done = done[rowsN, parent]
        flat_parent = (rowsN * K + parent).reshape(-1)  # (N*K,)
        k_caches = k_caches[:, flat_parent]
        v_caches = v_caches[:, flat_parent]

        new_tok = jnp.where(done, pad_idx, new_tok)
        tokens = tokens.at[:, :, t].set(new_tok)
        done = done | (new_tok == eos_idx)
        return (t + 1, tokens, new_scores, done, k_caches, v_caches)

    def step_cond(carry):
        # early exit once every beam of every row is finished — remaining
        # steps would only append <pad> at zero cost (the pad_only row above),
        # leaving tokens/scores unchanged, so the exit is outcome-identical
        t, _, _, done, _, _ = carry
        return (t < seq_len) & ~jnp.all(done)

    _, tokens, scores, done, _, _ = jax.lax.while_loop(
        step_cond, step_fn,
        (jnp.int32(1), tokens, scores, done, k_caches, v_caches),
    )

    if length_penalty:
        lengths = jnp.sum(tokens != pad_idx, axis=-1).astype(jnp.float32)
        norm = ((5.0 + lengths) / 6.0) ** length_penalty
        ranked = scores / norm
    else:
        ranked = scores
    best = jnp.argmax(ranked, axis=1)  # (N,)
    captions = tokens[jnp.arange(N), best]  # (N, seq_len)

    has_eos = jnp.any(captions == eos_idx, axis=1)
    last = jnp.where(has_eos, pad_idx, eos_idx).astype(jnp.int32)
    return jnp.concatenate([captions, last[:, None]], axis=1)
