"""Criterion parity vs the reference formulas computed with torch.

Each test re-runs the exact reference loss computation (criterion.py) through
public torch ops on the same random inputs and compares to our jnp criterion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_feature_learning_tpu.models.criterion import (
    COUNTER_CLASS_RATE,
    cross_entropy_with_gaussian_mask,
    label_smoothing_kl,
    label_smoothing_kl_logits,
    multilabel_soft_margin_loss,
    _bce_with_logits,
)


def test_counter_loss_matches_torch():
    """cross_entropy_with_gaussian_mask vs reference criterion.py:581-601."""
    rng = np.random.default_rng(0)
    B, C = 6, 11
    inputs = rng.normal(size=(B, C)).astype(np.float32)
    tgt_idx = rng.integers(0, C, size=B)
    onehot = np.zeros((B, C), dtype=np.float32)
    onehot[np.arange(B), tgt_idx] = 1
    weight = np.asarray(COUNTER_CLASS_RATE[:C], dtype=np.float32)

    # torch reference formula
    ti, tt = torch.from_numpy(inputs), torch.from_numpy(onehot)
    mu = torch.arange(C).unsqueeze(0).expand(C, C).float()
    x = mu.transpose(0, 1)
    mask_dict = torch.exp(-((x - mu) ** 2) / (2 * 2**2))
    _, ind = tt.max(dim=1)
    mask = mask_dict[ind]
    loss = F.binary_cross_entropy_with_logits(
        ti, tt, reduction="none", weight=1 - torch.from_numpy(weight)
    )
    coef = tt + ((1 - mask) ** 1.0) * (1 - tt)
    expected = (loss * coef).mean(1).mean().item()

    got = float(
        cross_entropy_with_gaussian_mask(
            jnp.asarray(inputs), jnp.asarray(onehot), jnp.asarray(weight), 1, 1.0
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_label_smoothing_kl_matches_torch():
    """label_smoothing_kl vs reference LabelSmoothing (criterion.py:545-575):
    dist built by scatter, pad zeroed, pad-target rows dropped, kl_div sum."""
    rng = np.random.default_rng(1)
    N, S, V = 5, 7, 23
    PAD = 1
    smoothing = 0.5
    logits = rng.normal(size=(N, S, V)).astype(np.float32)
    target = rng.integers(0, V, size=(N, S))
    target[0, 4:] = PAD
    target[3, :] = PAD  # fully padded row

    log_pred = np.asarray(jnp.asarray(logits) - jnp.log(jnp.sum(jnp.exp(logits), -1, keepdims=True)))

    # torch reference: pred are probabilities; LabelSmoothing does pred.log()
    pred = torch.softmax(torch.from_numpy(logits), dim=-1)
    tt = torch.from_numpy(target)
    p = pred.contiguous().view(-1, V)
    t = tt.contiguous().view(-1)
    dist = smoothing * torch.ones_like(p) / (V - 2)
    dist.scatter_(1, t.unsqueeze(-1).long(), 1 - smoothing)
    dist[:, PAD] = 0
    mask = torch.nonzero(t == PAD)
    if mask.sum() > 0 and len(mask) > 0:
        dist.index_fill_(0, mask.squeeze(), 0)
    expected = F.kl_div(p.log(), dist, reduction="sum").item()

    got = float(
        label_smoothing_kl(jnp.asarray(log_pred), jnp.asarray(target), PAD, smoothing)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-4)


def test_label_smoothing_kl_logits_equivalence():
    """The fused from-logits path (train hot path; no stored V-sized log-prob
    tensor) must agree with the log-prob path in value AND gradient."""
    rng = np.random.default_rng(7)
    N, S, V = 6, 9, 101
    PAD = 1
    smoothing = 0.5
    logits = (rng.normal(size=(N, S, V)) * 3).astype(np.float32)
    target = rng.integers(0, V, size=(N, S))
    target[0, 4:] = PAD
    target[2, :] = PAD

    x = jnp.asarray(logits)
    t = jnp.asarray(target)

    def via_log_probs(lg):
        return label_smoothing_kl(jax.nn.log_softmax(lg, axis=-1), t, PAD, smoothing)

    def via_logits(lg):
        return label_smoothing_kl_logits(lg, t, PAD, smoothing)

    v_ref, g_ref = jax.value_and_grad(via_log_probs)(x)
    v_new, g_new = jax.value_and_grad(via_logits)(x)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )

    # production-scale vocab sanity: the Σc·lse cancellation stays accurate
    V2 = 6563
    lg2 = jnp.asarray((rng.normal(size=(4, 19, V2)) * 5).astype(np.float32))
    t2 = jnp.asarray(rng.integers(0, V2, size=(4, 19)))
    a = float(label_smoothing_kl(jax.nn.log_softmax(lg2, -1), t2, PAD, smoothing))
    b = float(label_smoothing_kl_logits(lg2, t2, PAD, smoothing))
    np.testing.assert_allclose(b, a, rtol=5e-5)

    # bf16 logits (the production train path hands the head's compute-dtype
    # output straight to the loss): the fused path upcasting internally must
    # equal the log-prob path on the explicitly-upcast logits
    lg_bf = lg2.astype(jnp.bfloat16)
    a_bf = float(label_smoothing_kl(
        jax.nn.log_softmax(lg_bf.astype(jnp.float32), -1), t2, PAD, smoothing
    ))
    b_bf = float(label_smoothing_kl_logits(lg_bf, t2, PAD, smoothing))
    np.testing.assert_allclose(b_bf, a_bf, rtol=5e-5)


def test_label_smoothing_kl_logits_stack_equivalence():
    """Depth-vectorized stack losses == per-depth log-prob losses (value and
    summed-gradient), covering the criterion's train fast path."""
    from multimodal_feature_learning_tpu.models.criterion import (
        label_smoothing_kl_logits_stack,
    )

    rng = np.random.default_rng(11)
    D, N, S, V = 4, 5, 8, 73
    PAD = 1
    smoothing = 0.5
    stack = jnp.asarray((rng.normal(size=(D, N, S, V)) * 2).astype(np.float32))
    target = rng.integers(0, V, size=(N, S))
    target[1, 5:] = PAD
    t = jnp.asarray(target)

    def via_stack(lg):
        return label_smoothing_kl_logits_stack(lg, t, PAD, smoothing)

    def via_loop(lg):
        return jnp.stack([
            label_smoothing_kl(jax.nn.log_softmax(lg[i], -1), t, PAD, smoothing)
            for i in range(D)
        ])

    v_new = via_stack(stack)
    v_ref = via_loop(stack)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref), rtol=1e-5)

    g_new = jax.grad(lambda lg: via_stack(lg).sum())(stack)
    g_ref = jax.grad(lambda lg: via_loop(lg).sum())(stack)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_multilabel_soft_margin_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 13)).astype(np.float32)
    y = (rng.uniform(size=(4, 13)) > 0.6).astype(np.float32)
    expected = F.multilabel_soft_margin_loss(
        torch.from_numpy(x), torch.from_numpy(y)
    ).item()
    got = float(multilabel_soft_margin_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 9)).astype(np.float32) * 5
    y = (rng.uniform(size=(5, 9)) > 0.5).astype(np.float32)
    expected = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(y), reduction="none"
    ).numpy()
    got = np.asarray(_bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_criterion_fast_path_matches_legacy_dict_plumbing():
    """SetCriterion's train fast path (``pred_captions_all`` logits stack)
    must produce the SAME loss-dict keys and values as the legacy eval-path
    plumbing (log-prob ``pred_captions`` + ``aux_outputs_caption`` list)."""
    from multimodal_feature_learning_tpu.models.criterion import SetCriterion

    rng = np.random.default_rng(5)
    D, N, S1, V = 3, 4, 8, 31   # S1 = max_caption_len; model sees S1-1 targets
    PAD = 1
    stack = jnp.asarray((rng.normal(size=(D, N, S1 - 1, V)) * 2).astype(np.float32))
    cap = rng.integers(2, V, size=(N, S1))
    cap[0, 5:] = PAD
    cap[3, 2:] = PAD
    targets = {
        "cap_tokens": jnp.asarray(cap),
        "gt_mask": jnp.ones((2, 2), dtype=jnp.float32),
    }
    crit = SetCriterion(
        num_classes=1, weight_dict={}, losses=["captions"],
        pad_idx=PAD, smoothing=0.5,
    )

    fast = crit(
        {"pred_captions": stack[-1], "caption_head": "logits",
         "pred_captions_all": stack},
        targets, None, None, None,
    )
    legacy = crit(
        {"pred_captions": jax.nn.log_softmax(stack[-1], axis=-1),
         "aux_outputs_caption": [
             {"pred_captions": jax.nn.log_softmax(stack[i], axis=-1)}
             for i in range(D - 1)
         ]},
        targets, None, None, None,
    )
    assert set(fast) == set(legacy) == {"loss_caption", "loss_caption_0", "loss_caption_1"}
    for k in fast:
        np.testing.assert_allclose(float(fast[k]), float(legacy[k]), rtol=1e-5)
