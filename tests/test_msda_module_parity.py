"""MSDeformAttn module parity: same weights pushed through a torch evaluation
of the reference formulas (attention.py:444-507) must reproduce our flax
module's sampling locations, attention weights, and output."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_ms_deform_attn import torch_oracle
from multimodal_feature_learning_tpu.models.msda_module import (
    MSDeformAttn,
    _offset_bias_init,
)

B, Q, D, H, L, P = 2, 5, 32, 4, 3, 2
SHAPES = (8, 4, 2)
S = sum(SHAPES)


def test_offset_bias_matches_reference_init():
    """Directional bias grid vs a torch re-evaluation of attention.py:427-435."""
    import math

    thetas = torch.arange(H, dtype=torch.float32) * (2 * math.pi / H)
    grid = torch.stack([thetas.cos(), thetas.sin()], -1)
    grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(H, 1, 1, 2)
    grid = grid[..., 0].repeat(1, L, P)
    for i in range(P):
        grid[:, :, i] *= i + 1
    expected = grid.view(-1).numpy()
    got = _offset_bias_init(H, L, P)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_module_forward_matches_torch():
    rng = np.random.default_rng(0)
    query = rng.normal(size=(B, Q, D)).astype(np.float32)
    value_in = rng.normal(size=(B, S, D)).astype(np.float32)
    refs = rng.uniform(0.1, 0.9, size=(B, Q, L, 1)).astype(np.float32)
    pad = np.zeros((B, S), dtype=bool)
    pad[1, -3:] = True

    module = MSDeformAttn(d_model=D, n_levels=L, n_heads=H, n_points=P, backend="gather")
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(refs),
        jnp.asarray(value_in), SHAPES, jnp.asarray(pad),
    )
    out, loc, attn = module.apply(
        params, jnp.asarray(query), jnp.asarray(refs),
        jnp.asarray(value_in), SHAPES, jnp.asarray(pad),
    )

    # torch evaluation with the same weights (flax kernel = torch weight^T)
    p = params["params"]
    lin = lambda x, name: x @ torch.from_numpy(np.asarray(p[name]["kernel"])) + torch.from_numpy(np.asarray(p[name]["bias"]))
    qt = torch.from_numpy(query)
    vt = torch.from_numpy(value_in)

    value = lin(vt, "value_proj")
    value = value.masked_fill(torch.from_numpy(pad)[..., None], 0.0)
    value = value.view(B, S, H, D // H)

    offsets = lin(qt, "sampling_offsets").view(B, Q, H, L, P)
    aw = lin(qt, "attention_weights").view(B, Q, H, L * P)
    aw = F.softmax(aw, -1).view(B, Q, H, L, P)

    shapes_t = torch.tensor(SHAPES, dtype=torch.float32)
    rt = torch.from_numpy(refs)
    loc_t = rt[:, :, None, :, 0:1] + offsets / shapes_t[None, None, None, :, None]

    np.testing.assert_allclose(np.asarray(loc), loc_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), aw.numpy(), rtol=1e-4, atol=1e-5)

    core = torch_oracle(
        value.numpy(), SHAPES, loc_t.numpy().astype(np.float32), aw.numpy().astype(np.float32)
    )
    expected = lin(torch.from_numpy(core), "output_proj").numpy()
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)


def test_ref_dim2_branch():
    """(center, length) reference boxes: loc = c + offs/P * l * 0.5."""
    rng = np.random.default_rng(1)
    query = rng.normal(size=(B, Q, D)).astype(np.float32)
    value_in = rng.normal(size=(B, S, D)).astype(np.float32)
    refs2 = rng.uniform(0.2, 0.8, size=(B, Q, L, 2)).astype(np.float32)

    module = MSDeformAttn(d_model=D, n_levels=L, n_heads=H, n_points=P, backend="gather")
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(refs2),
        jnp.asarray(value_in), SHAPES,
    )
    out, loc, attn = module.apply(
        params, jnp.asarray(query), jnp.asarray(refs2), jnp.asarray(value_in), SHAPES
    )
    p = params["params"]
    lin = lambda x, name: x @ torch.from_numpy(np.asarray(p[name]["kernel"])) + torch.from_numpy(np.asarray(p[name]["bias"]))
    offsets = lin(torch.from_numpy(query), "sampling_offsets").view(B, Q, H, L, P)
    rt = torch.from_numpy(refs2)
    loc_t = rt[:, :, None, :, 0:1] + offsets / P * rt[:, :, None, :, 1:2] * 0.5
    np.testing.assert_allclose(np.asarray(loc), loc_t.numpy(), rtol=1e-4, atol=1e-5)
