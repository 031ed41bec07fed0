"""Mixed-precision (compute_dtype=bfloat16) invariants and parity.

Policy under test (utils/precision.py): master params f32, trunk compute
bf16, matcher/criterion/softmax/log-probs f32.  The reference has no mixed
precision; parity here is f32-vs-bf16 of OUR model (loose tolerances — bf16
has ~8 mantissa bits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_feature_learning_tpu.models.criterion import (
    SetCriterion,
    build_weight_dict,
)
from multimodal_feature_learning_tpu.models.dvc import build_model

from test_model_forward import PAD, VOCAB, small_cfg, synthetic_batch

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg32 = small_cfg()
    cfg16 = small_cfg()
    cfg16.compute_dtype = "bfloat16"
    model32 = build_model(cfg32, VOCAB)
    model16 = build_model(cfg16, VOCAB)
    batch = synthetic_batch(cfg32)
    params = model32.init(jax.random.PRNGKey(0), batch)
    return cfg16, model32, model16, batch, params


def test_master_params_stay_f32(setup):
    _, _, model16, batch, params = setup
    leaves = jax.tree_util.tree_leaves(params)
    assert all(
        l.dtype == jnp.float32
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    )


def test_boundary_dtypes(setup):
    """Trunk memory is bf16; everything the matcher/criterion consume is f32."""
    _, _, model16, batch, params = setup
    p16 = model16._cast_params(params)
    out, indices, _ = model16._propose_and_match(
        p16, batch, deterministic=True, with_aux=False
    )
    assert out["memory"].dtype == jnp.bfloat16
    assert out["query_features"].dtype == jnp.bfloat16
    assert out["pred_segments"].dtype == jnp.float32
    assert out["pred_count"].dtype == jnp.float32
    assert out["outputs_segment_all"].dtype == jnp.float32
    assert indices.dtype == jnp.int32


def test_eval_parity_f32_vs_bf16(setup):
    """Same params: bf16 eval stays close to f32 (proposals + caption logits)."""
    _, model32, model16, batch, params = setup
    out32, cap32, idx32, _, _ = jax.jit(
        lambda p, b: model32.forward_eval(p, b, "teacher_forcing")
    )(params, batch)
    out16, cap16, idx16, _, _ = jax.jit(
        lambda p, b: model16.forward_eval(p, b, "teacher_forcing")
    )(params, batch)
    np.testing.assert_allclose(
        np.asarray(out32["pred_segments"]),
        np.asarray(out16["pred_segments"]),
        atol=0.05,
    )
    # log-prob dtype contract and bulk agreement of the argmax tokens
    assert out16["pred_captions"].dtype == jnp.float32
    agree = np.mean(np.asarray(cap32) == np.asarray(cap16))
    assert agree > 0.9, f"token agreement {agree}"


def test_train_step_bf16_finite_and_f32_grads(setup):
    cfg16, _, model16, batch, params = setup
    weight_dict = build_weight_dict(cfg16)
    criterion = SetCriterion(
        num_classes=cfg16.dvc.num_classes,
        weight_dict=weight_dict,
        losses=list(cfg16.dvc.losses),
        pad_idx=PAD,
        smoothing=cfg16.dvc.smoothing,
    )

    def loss_fn(p):
        out, idx, idx_aux, mm = model16.forward_train(
            p, batch, jax.random.PRNGKey(1)
        )
        losses = criterion(out, batch, idx, idx_aux, mm)
        return sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gleaves = jax.tree_util.tree_leaves(grads)
    assert all(
        g.dtype == jnp.float32
        for g in gleaves
        if jnp.issubdtype(g.dtype, jnp.floating)
    )
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)


def test_greedy_serve_bf16_runs(setup):
    _, _, model16, batch, params = setup
    _, captions, _, _, _ = jax.jit(
        lambda p, b: model16.forward_eval(p, b, "serve")
    )(params, batch)
    assert captions.dtype == jnp.int32
    assert captions.shape[-1] == model16.seq_len + 1
