"""BiModalEncoder behavior (reference models/regular/bimodal_encoder.py +
modules/layers.py:269-385 — whose live torch code cannot even construct:
`MLP(..., dropout_1=dropout_1)` raises NameError, so there is no torch oracle;
this is the repaired intended design)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.models.backbones import BiModalEncoder

B, TV, TA, D = 2, 6, 4, 32


@pytest.fixture(params=[True, False], ids=["pre_norm", "post_norm"])
def enc_and_params(request):
    enc = BiModalEncoder(d_model=D, depth=2, num_heads=4, pre_norm=request.param)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.normal(size=(B, TV, D)).astype(np.float32))
    aud = jnp.asarray(rng.normal(size=(B, TA, D)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), vid, aud)
    return enc, params, vid, aud


def test_shapes_finite_and_jits(enc_and_params):
    enc, params, vid, aud = enc_and_params
    v, a = jax.jit(lambda p, v, a: enc.apply(p, v, a))(params, vid, aud)
    assert v.shape == (B, TV, D) and a.shape == (B, TA, D)
    assert np.isfinite(np.asarray(v)).all() and np.isfinite(np.asarray(a)).all()


def test_cross_modal_coupling(enc_and_params):
    """Each modality's output must depend on the OTHER modality (the layer is
    cross-attention, not two parallel self-attentions)."""
    enc, params, vid, aud = enc_and_params
    v0, a0 = enc.apply(params, vid, aud)
    aud2 = aud.at[:, 0].add(1.0)
    v1, a1 = enc.apply(params, vid, aud2)
    assert not np.allclose(np.asarray(v0), np.asarray(v1)), "video ignores audio"
    vid2 = vid.at[:, 0].add(1.0)
    v2, a2 = enc.apply(params, vid2, aud)
    assert not np.allclose(np.asarray(a0), np.asarray(a2)), "audio ignores video"


def test_gradients_reach_both_modalities(enc_and_params):
    enc, params, vid, aud = enc_and_params

    def loss(params):
        v, a = enc.apply(params, vid, aud)
        return jnp.sum(v**2) + jnp.sum(a**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero == len(leaves), "dead parameters in the bimodal encoder"


def test_residual_identity_at_zero_scale():
    """With attention+MLP outputs forced to ~0 (zeroed projections), pre-norm
    reduces to identity (pure residual stream) — the residual wiring matches
    the reference forward_pre."""
    enc = BiModalEncoder(d_model=D, depth=1, num_heads=4, pre_norm=True)
    rng = np.random.default_rng(1)
    vid = jnp.asarray(rng.normal(size=(B, TV, D)).astype(np.float32))
    aud = jnp.asarray(rng.normal(size=(B, TA, D)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), vid, aud)
    params = jax.tree_util.tree_map(np.array, params)

    def zero(sub):
        for k in sub:
            if isinstance(sub[k], dict):
                zero(sub[k])
            elif k in ("kernel", "bias"):
                sub[k][...] = 0.0

    layer = params["params"]["layer_0"]
    for name in ("attention_av", "attention_va"):
        zero(layer[name]["projection_layer"])
    for name in ("mlp_av", "mlp_va"):
        zero(layer[name]["fully_connected_2"])

    v, a = enc.apply(params, vid, aud)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vid), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(aud), atol=1e-6)
