"""Attention / MLP building blocks.

Behavioral spec: reference ``models/modules/layers.py`` (MLP :827-869,
FFN :871-906, ContextMaskModel :909-944, UnimodalCaptionDecoderLayer :509-644)
and ``models/modules/attention.py`` (CrossAttention :213-306).  MaskPredictor
follows ``models/sparse/unimodal_sparse_deformable_transformer.py:634-657``.

All attention here is vanilla dense attention (20-query self-attn and caption
cross-attn); it runs as plain batched matmuls that XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_MASK = -1e20  # reference masked_fill value (attention.py:289-292)


class CrossAttention(nn.Module):
    """Multi-head attention with the reference's exact masking/scale order:
    logits = q @ k^T; masked_fill(-1e20); * head_dim**-0.5; softmax.

    q/kv projection and the attend step are separate methods so incremental
    (KV-cached) decoding can reuse cached projections.
    """

    d_model: int
    num_heads: int
    qkv_bias: bool = True
    attention_dropout: float = 0.0

    def setup(self):
        self.q_linear = nn.Dense(self.d_model, use_bias=self.qkv_bias)
        self.k_linear = nn.Dense(self.d_model, use_bias=self.qkv_bias)
        self.v_linear = nn.Dense(self.d_model, use_bias=self.qkv_bias)
        self.projection_layer = nn.Dense(self.d_model)
        self.attn_drop = nn.Dropout(self.attention_dropout)

    def project_q(self, q: jnp.ndarray) -> jnp.ndarray:
        return self.q_linear(q)

    def project_kv(self, k: jnp.ndarray, v: jnp.ndarray):
        return self.k_linear(k), self.v_linear(v)

    def attend(
        self,
        qp: jnp.ndarray,  # (N, Tq, D) projected; N = B * groups
        kp: jnp.ndarray,  # (B, Tk, D) projected (B = N unless groups > 1)
        vp: jnp.ndarray,  # (B, Tk, D) projected
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (N, Tk)
        deterministic: bool = True,
        groups: int = 1,
        zeroed_mask: Optional[jnp.ndarray] = None,  # (N, Tk), shared-KV only
    ) -> jnp.ndarray:
        """groups > 1: shared-KV attention — `groups` consecutive query rows
        share one k/v row (queries row-major over (B, groups)). The k/v
        tensors are read once per *group* instead of once per row, cutting
        HBM traffic ~groups×; masked positions make it math-identical to
        materializing per-row copies of the shared memory.

        zeroed_mask marks positions whose k/v inputs are ZERO in the
        materialized-crop semantics (reference unimodal_sparse_dvc.py:480-516)
        but may still be attendable (key_padding_mask False) — e.g. the
        differentiable context mask unmasking tokens outside the crop. All
        such positions share identical k/v (the projection biases), so their
        m softmax columns collapse exactly into ONE extra column with logit
        q·k_bias·scale + log(m) and value v_bias.

        Caveat (deterministic=False only): attn_drop on the collapsed column
        applies ONE Bernoulli draw to all m folded positions, where the
        materialized crop would drop each of the m columns independently —
        same expectation, lower variance. Exact collapse therefore holds in
        eval/deterministic mode; training stochastics differ slightly from
        the reference when attention_dropout > 0 and the differentiable
        context mask is on."""
        N, Tq, _ = qp.shape
        B, Tk = kp.shape[0], kp.shape[1]
        H = self.num_heads
        Dh = self.d_model // H
        scale = Dh**-0.5

        qh = qp.reshape(B, groups * Tq, H, Dh).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)

        # match the (possibly reduced-precision) kv dtype so a bf16 KV cache
        # is read as bf16 instead of being upcast-copied. The dot runs in the
        # operand dtype (TPU MXU accumulates bf16 x bf16 in f32 internally)
        # and the logits are upcast for masking/softmax AFTER the dot — an
        # explicit preferred_element_type=f32 here would force the backward
        # dots to f32 (measured via tools/audit_dtypes.py).
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh.astype(kh.dtype), kh
        ).astype(jnp.float32)  # (B, H, groups*Tq, Tk)
        if attn_mask is not None:
            assert groups == 1 and zeroed_mask is None, (
                "attn_mask unsupported on the shared-KV/bias-column path"
            )
            logits = jnp.where(attn_mask, NEG_MASK, logits)
        # the fast path has no bias-column handling, so a zeroed_mask
        # (differentiable-context-mask crop semantics) must take the shared
        # path even at groups == 1 (e.g. max_gt_target_segments == 1)
        if groups == 1 and zeroed_mask is None:
            if key_padding_mask is not None:
                logits = jnp.where(
                    key_padding_mask[:, None, None, :], NEG_MASK, logits
                )
            attn = nn.softmax(logits * scale, axis=-1)
            attn = self.attn_drop(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh
            ).astype(qp.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(N, Tq, self.d_model)
            return self.projection_layer(out)

        # -- shared-KV path ---------------------------------------------------
        # shared k/v are only valid where the crop is non-zero: zeroed-but-
        # attendable positions are folded into the bias column below
        pad = key_padding_mask
        if pad is None:
            pad = jnp.zeros((N, Tk), dtype=bool)
        shared_block = pad | zeroed_mask if zeroed_mask is not None else pad
        mask5 = shared_block.reshape(B, 1, groups, 1, Tk)
        logits5 = jnp.where(mask5, NEG_MASK, logits.reshape(B, H, groups, Tq, Tk))
        scaled = logits5.reshape(B, H, groups * Tq, Tk) * scale

        if zeroed_mask is not None:
            # bias column: m attendable zeroed positions, all with k = k_bias
            zeros_in = jnp.zeros((1, 1, self.d_model), dtype=kp.dtype)
            k_bias, v_bias = self.k_linear(zeros_in), self.v_linear(zeros_in)
            kb = k_bias.reshape(H, Dh).astype(kh.dtype)   # (H, Dh)
            vb = v_bias.reshape(H, Dh).astype(vh.dtype)
            l_bias = jnp.einsum(
                "bhqd,hd->bhq", qh.astype(kh.dtype), kb
            ).astype(jnp.float32) * scale  # (B, H, groups*Tq)
            m = jnp.sum(~pad & zeroed_mask, axis=1).astype(jnp.float32)  # (N,)
            log_m = jnp.where(m > 0, jnp.log(jnp.maximum(m, 1.0)), NEG_MASK)
            log_m5 = jnp.broadcast_to(
                log_m.reshape(B, 1, groups, 1), (B, H, groups, Tq)
            ).reshape(B, H, groups * Tq)
            bias_logit = l_bias + log_m5  # (B, H, groups*Tq)
            # softmax over the augmented [scaled | bias] axis WITHOUT
            # materializing the concatenated (…, Tk+1) tensor: profiling
            # (tools/profile_bytes.py) showed the concatenate + its layout
            # copies costing ~55 MB f32 per call, 12× per train step. The
            # explicit max-shifted form below is the same math as
            # nn.softmax(concat([scaled, bias_col])) — shared max, shared
            # denominator — with the bias column handled as scalars.
            m_max = jax.lax.stop_gradient(
                jnp.maximum(jnp.max(scaled, axis=-1), bias_logit)
            )  # (B, H, groups*Tq)
            e_main = jnp.exp(scaled - m_max[..., None])
            e_bias = jnp.exp(bias_logit - m_max)
            denom = jnp.sum(e_main, axis=-1) + e_bias
            attn = e_main / denom[..., None]
            attn_bias = e_bias / denom  # (B, H, groups*Tq)
            attn = self.attn_drop(attn, deterministic=deterministic)
            attn_bias = self.attn_drop(
                attn_bias[..., None], deterministic=deterministic
            )[..., 0]
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh
            ) + attn_bias[..., None].astype(jnp.float32) * vb[None, :, None, :]
        else:
            attn = nn.softmax(scaled, axis=-1)
            attn = self.attn_drop(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh
            )
        out = out.astype(qp.dtype).transpose(0, 2, 1, 3).reshape(N, Tq, self.d_model)
        return self.projection_layer(out)

    def __call__(
        self,
        q: jnp.ndarray,  # (B, Tq, D)
        k: jnp.ndarray,  # (B, Tk, D)
        v: jnp.ndarray,  # (B, Tk, D)
        attn_mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Tq, Tk), True=masked
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Tk), True=masked
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qp = self.project_q(q)
        kp, vp = self.project_kv(k, v)
        return self.attend(qp, kp, vp, attn_mask, key_padding_mask, deterministic)


class MLP(nn.Module):
    """2-layer GELU MLP; reference layers.py:827-869."""

    hidden_dim: int
    out_dim: int
    dropout_1: float = 0.0
    dropout_2: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, name="fully_connected_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_1)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="fully_connected_2")(x)
        return nn.Dropout(self.dropout_2)(x, deterministic=deterministic)


class FFN(nn.Module):
    """n-layer ReLU feed-forward head; reference layers.py:871-906.

    ``final_zero_init`` reproduces the segment-head initialization of the
    reference (unimodal_sparse_dvc.py:75-79: last layer weight+bias zeroed)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    final_zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.out_dim if last else self.hidden_dim
            kwargs = {}
            if last and self.final_zero_init:
                kwargs["kernel_init"] = nn.initializers.zeros
            x = nn.Dense(out, name=f"layers_{i}", **kwargs)(x)
            if not last:
                x = nn.relu(x)
        return x


class ContextMaskModel(nn.Module):
    """3-layer ReLU MLP predicting per-token memory masks; layers.py:909-944."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        x = nn.relu(nn.Dense(in_dim // 2, name="layer_1")(x))
        x = nn.relu(nn.Dense(in_dim // 2, name="layer_2")(x))
        return nn.Dense(self.out_dim, name="layer_3")(x)


class MaskPredictor(nn.Module):
    """Sparse-DETR saliency net: LN->Dense->GELU, split local/global halves,
    global mean-pooled and re-broadcast, then a 3-Dense GELU tower to 1 logit.
    Reference unimodal_sparse_deformable_transformer.py:634-657."""

    h_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, S, D) -> (B, S)
        z = nn.LayerNorm(name="norm")(x)
        z = nn.gelu(nn.Dense(self.h_dim, name="dense_in")(z), approximate=False)
        z_local, z_global = jnp.split(z, 2, axis=-1)
        z_global = jnp.broadcast_to(
            z_global.mean(axis=1, keepdims=True), z_local.shape
        )
        z = jnp.concatenate([z_local, z_global], axis=-1)
        z = nn.gelu(nn.Dense(self.h_dim // 2, name="dense_1")(z), approximate=False)
        z = nn.gelu(nn.Dense(self.h_dim // 4, name="dense_2")(z), approximate=False)
        return nn.Dense(1, name="dense_out")(z)[..., 0]


class UnimodalCaptionDecoderLayer(nn.Module):
    """Post-norm caption decoder block: self-attn, cross-attn, MLP.
    Reference layers.py:509-644 (pre_norm=False path, :605-628)."""

    d_model: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    projection_dropout: float = 0.0
    mlp_dropout_1: float = 0.0
    mlp_dropout_2: float = 0.0
    pre_norm: bool = False

    def setup(self):
        self.self_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.cross_attention = CrossAttention(
            self.d_model, self.num_heads, self.qkv_bias, self.attention_dropout
        )
        self.layer_norm_1 = nn.LayerNorm(epsilon=1e-6)
        self.layer_norm_2 = nn.LayerNorm(epsilon=1e-6)
        self.layer_norm_3 = nn.LayerNorm(epsilon=1e-6)
        self.drop_1 = nn.Dropout(self.projection_dropout)
        self.drop_2 = nn.Dropout(self.projection_dropout)
        self.mlp = MLP(
            int(self.d_model * self.mlp_ratio),
            self.d_model,
            self.mlp_dropout_1,
            self.mlp_dropout_2,
        )

    def _sa(self, x, tgt_mask, tgt_padding_mask, deterministic):
        out = self.self_attention(
            x, x, x,
            attn_mask=tgt_mask,
            key_padding_mask=tgt_padding_mask,
            deterministic=deterministic,
        )
        return self.drop_1(out, deterministic=deterministic)

    def _ca(self, x, mem, memory_padding_mask, deterministic, groups=1,
            zeroed_mask=None):
        qp = self.cross_attention.project_q(x)
        kp, vp = self.cross_attention.project_kv(mem, mem)
        out = self.cross_attention.attend(
            qp, kp, vp,
            key_padding_mask=memory_padding_mask,
            deterministic=deterministic,
            groups=groups,
            zeroed_mask=zeroed_mask,
        )
        return self.drop_2(out, deterministic=deterministic)

    def __call__(
        self,
        target: jnp.ndarray,  # (N, Tc, D)
        memory: jnp.ndarray,  # (N, S, D), or (B, S, D) with groups = N // B
        tgt_mask=None,
        tgt_padding_mask=None,
        memory_padding_mask=None,
        deterministic: bool = True,
        groups: int = 1,
        zeroed_mask=None,
    ) -> jnp.ndarray:
        x = target
        if self.pre_norm:
            x = x + self._sa(self.layer_norm_1(x), tgt_mask, tgt_padding_mask, deterministic)
            x = x + self._ca(self.layer_norm_2(x), memory, memory_padding_mask, deterministic, groups, zeroed_mask)
            x = x + self.mlp(self.layer_norm_3(x), deterministic=deterministic)
        else:
            x = self.layer_norm_1(x + self._sa(x, tgt_mask, tgt_padding_mask, deterministic))
            x = self.layer_norm_2(x + self._ca(x, memory, memory_padding_mask, deterministic, groups, zeroed_mask))
            x = self.layer_norm_3(x + self.mlp(x, deterministic=deterministic))
        return x

    def project_memory_kv(self, memory: jnp.ndarray):
        """Cross-attn k/v of the (caption-independent) memory, cached once per decode."""
        return self.cross_attention.project_kv(memory, memory)

    def incremental_pair(
        self,
        x: jnp.ndarray,          # (N, 2, D): [commit position step, predict position step+1]
        step: jnp.ndarray,       # position being committed (row 0)
        k_cache: jnp.ndarray,    # (N, Tc, D)
        v_cache: jnp.ndarray,
        valid_len: jnp.ndarray,  # attendable prefix length AFTER the commit
        mem_k: jnp.ndarray,
        mem_v: jnp.ndarray,
        memory_padding_mask,
        groups: int = 1,
        zeroed_mask=None,
    ):
        """Fused commit+predict step: one layer pass for two positions.

        Row 0 (the token being committed at ``step``) writes its projected
        k/v into the cache and attends keys [0, valid_len) — which includes
        itself; row 1 (the speculative pad query at ``step+1``) attends the
        same prefix — which includes the just-committed key but not its own
        (nothing is cached at step+1).  Identical math to two ``incremental``
        calls, at half the cache/memory traffic.

        ``step``/``valid_len`` may be scalars (whole batch in lockstep — the
        batch greedy decode) or (N,) arrays (per-row positions — the
        continuous-batching serve path, where slots join mid-flight at t=0
        while others are mid-caption).
        """
        assert not self.pre_norm
        N, _, D = x.shape
        Tc = k_cache.shape[1]

        kx, vx = self.self_attention.project_kv(x[:, :1], x[:, :1])
        if jnp.ndim(step) == 1:
            rows = jnp.arange(N)
            k_cache = k_cache.at[rows, step].set(kx[:, 0])
            v_cache = v_cache.at[rows, step].set(vx[:, 0])
            key_mask = jnp.arange(Tc)[None, :] >= valid_len[:, None]
        else:
            k_cache = jax.lax.dynamic_update_slice(k_cache, kx, (0, step, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, vx, (0, step, 0))
            key_mask = (jnp.arange(Tc) >= valid_len)[None, :]
        qx = self.self_attention.project_q(x)
        sa = self.self_attention.attend(
            qx, k_cache, v_cache,
            key_padding_mask=jnp.broadcast_to(key_mask, (N, Tc)),
        )
        x = self.layer_norm_1(x + self.drop_1(sa, deterministic=True))

        qc = self.cross_attention.project_q(x)
        ca = self.cross_attention.attend(
            qc, mem_k, mem_v, key_padding_mask=memory_padding_mask,
            groups=groups, zeroed_mask=zeroed_mask,
        )
        x = self.layer_norm_2(x + self.drop_2(ca, deterministic=True))
        x = self.layer_norm_3(x + self.mlp(x, deterministic=True))
        return x, k_cache, v_cache

    def incremental(
        self,
        x: jnp.ndarray,          # (N, 1, D) layer input at one position
        step: jnp.ndarray,       # scalar int: position being processed
        k_cache: jnp.ndarray,    # (N, Tc, D) projected self-attn keys of committed tokens
        v_cache: jnp.ndarray,    # (N, Tc, D)
        valid_len: jnp.ndarray,  # scalar int: keys [0, valid_len) are attendable
        mem_k: jnp.ndarray,      # (N, S, D) cached memory keys ((B, S, D) if groups > 1)
        mem_v: jnp.ndarray,      # (N, S, D)
        memory_padding_mask,     # (N, S) True=masked
        write_self: bool,        # static: commit (True) vs speculative predict (False)
        groups: int = 1,
        zeroed_mask=None,
    ):
        """One-position decode step with KV caching (post-norm only).

        A "commit" writes this token's projected k/v into the cache at ``step``
        before attending (so the token attends itself, matching the reference's
        full re-run where committed tokens are non-pad); a "predict" leaves the
        cache untouched (the reference masks the current pad position's key).
        """
        assert not self.pre_norm, "incremental decode implemented for post-norm"
        N, _, D = x.shape
        Tc = k_cache.shape[1]

        kx, vx = self.self_attention.project_kv(x, x)  # (N, 1, D)
        if write_self:
            k_cache = jax.lax.dynamic_update_slice(k_cache, kx, (0, step, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, vx, (0, step, 0))

        key_mask = (jnp.arange(Tc) >= valid_len)[None, :]  # (1, Tc) True=masked
        qx = self.self_attention.project_q(x)
        sa = self.self_attention.attend(
            qx, k_cache, v_cache, key_padding_mask=jnp.broadcast_to(key_mask, (N, Tc))
        )
        x = self.layer_norm_1(x + self.drop_1(sa, deterministic=True))

        qc = self.cross_attention.project_q(x)
        ca = self.cross_attention.attend(
            qc, mem_k, mem_v, key_padding_mask=memory_padding_mask,
            groups=groups, zeroed_mask=zeroed_mask,
        )
        x = self.layer_norm_2(x + self.drop_2(ca, deterministic=True))
        x = self.layer_norm_3(x + self.mlp(x, deterministic=True))
        return x, k_cache, v_cache
