"""Pallas MSDA kernel vs the jnp gather oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.ops import ms_deform_attn_core
from multimodal_feature_learning_tpu.ops.pallas_msda import ms_deform_attn_pallas

SHAPES = (12, 6, 3)


def make_inputs(seed=0, B=2, H=2, Dh=4, Q=5, P=3):
    rng = np.random.default_rng(seed)
    S = sum(SHAPES)
    L = len(SHAPES)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P)).astype(np.float32)
    aw = rng.uniform(size=(B, Q, H, L, P)).astype(np.float32)
    aw = aw / aw.reshape(B, Q, H, -1).sum(-1)[..., None, None]
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)


def test_pallas_forward_matches_oracle():
    value, loc, aw = make_inputs()
    expected = ms_deform_attn_core(value, SHAPES, loc, aw, backend="gather")
    got = ms_deform_attn_pallas(value, SHAPES, loc, aw, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_pallas_grads_match_oracle():
    value, loc, aw = make_inputs(seed=1, B=1, H=2, Dh=8, Q=7, P=2)

    def loss_pallas(v, l, a):
        return (ms_deform_attn_pallas(v, SHAPES, l, a, True) ** 2).sum()

    def loss_oracle(v, l, a):
        return (ms_deform_attn_core(v, SHAPES, l, a, backend="gather") ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(value, loc, aw)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(value, loc, aw)
    for a, b, name in zip(gp, go, ("value", "loc", "aw")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_fused_bwd_matches_xla_formulation():
    """The fused backward kernel (_bwd_pallas: splat + cotangent VMEM-only)
    equals the XLA-ops formulation it replaced (_vjp_bwd_xla)."""
    from multimodal_feature_learning_tpu.ops.pallas_msda import (
        _bwd_pallas, _vjp_bwd_xla,
    )

    value, loc, aw = make_inputs(seed=2, B=2, H=2, Dh=8, Q=9, P=4)
    rng = np.random.default_rng(3)
    g = jnp.asarray(
        rng.normal(size=(value.shape[0], loc.shape[1],
                         value.shape[2] * value.shape[3])).astype(np.float32)
    )
    fused = _bwd_pallas(value, SHAPES, loc, aw, g, interpret=True)
    ref = _vjp_bwd_xla(SHAPES, True, (value, loc, aw), g)
    for a, b, name in zip(fused, ref, ("dvalue", "dloc", "daw")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_qtiled_bwd_dense_encoder_shape():
    """Q-tiling correctness at a multi-tile Q (the dense-encoder case that
    exceeded VMEM untiled — VERDICT r3 item 8): grads must match the gather
    oracle when the backward grid spans several Q tiles, including a ragged
    final tile, and dValue accumulates across them."""
    # Q=37 with q_tile=16 -> 3 tiles (last ragged); small dims keep interpret
    # mode fast while exercising exactly the tiled code path
    value, loc, aw = make_inputs(seed=4, B=1, H=2, Dh=8, Q=37, P=2)
    rng = np.random.default_rng(5)
    g = jnp.asarray(
        rng.normal(size=(value.shape[0], loc.shape[1],
                         value.shape[2] * value.shape[3])).astype(np.float32))

    from multimodal_feature_learning_tpu.ops.pallas_msda import _bwd_pallas

    tiled = _bwd_pallas(value, SHAPES, loc, aw, g, interpret=True, q_tile=16)
    single = _bwd_pallas(value, SHAPES, loc, aw, g, interpret=True, q_tile=64)

    def loss(v, l, a):
        out = ms_deform_attn_core(v, SHAPES, l, a, backend="gather")
        return jnp.sum(out * g)

    oracle = jax.grad(loss, argnums=(0, 1, 2))(value, loc, aw)
    for got, ref, name in zip(tiled, oracle, ("value", "loc", "aw")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    for a, b in zip(tiled, single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
