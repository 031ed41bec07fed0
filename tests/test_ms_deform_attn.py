"""Parity tests for the deformable-attention core.

Oracle: torch.nn.functional.grid_sample, i.e. the exact computation the
reference's live path runs (models/modules/attention.py:331-383), re-run here
through the public torch API (no reference code imported or copied).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_feature_learning_tpu.ops import ms_deform_attn_core

SHAPES = (6, 3, 2)  # levels: 6 + 3 + 2 tokens


def torch_oracle(value, temporal_shapes, sampling_locations, attention_weights):
    """1-D MSDA via grid_sample(bilinear, border, align_corners=False)."""
    value = torch.from_numpy(value)
    loc = torch.from_numpy(sampling_locations)
    aw = torch.from_numpy(attention_weights)
    B, S, H, Dh = value.shape
    _, Q, _, L, P = loc.shape
    value_list = value.split(list(temporal_shapes), dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, T in enumerate(temporal_shapes):
        v = (
            value_list[lid]
            .flatten(2)
            .transpose(1, 2)
            .reshape(B * H, Dh, T)
            .unsqueeze(-1)
        )  # (B*H, Dh, T, 1)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*H, Q, P)
        g = g.flatten(1, 2).reshape(B * H, 1, -1)  # (B*H, 1, Q*P)
        g = torch.stack([-torch.ones_like(g), g], dim=-1)  # (B*H, 1, Q*P, 2)
        s = F.grid_sample(
            v, g, mode="bilinear", padding_mode="border", align_corners=False
        )  # (B*H, Dh, 1, Q*P)
        sampled.append(s.reshape(B * H, Dh, Q, P))
    aw_t = aw.transpose(1, 2).reshape(B * H, 1, Q, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw_t).sum(-1)
    return out.view(B, H * Dh, Q).transpose(1, 2).contiguous().numpy()


def make_inputs(seed=0, B=2, H=2, Dh=4, Q=5, P=3, loc_range=(-0.2, 1.2)):
    rng = np.random.default_rng(seed)
    S = sum(SHAPES)
    L = len(SHAPES)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(*loc_range, size=(B, Q, H, L, P)).astype(np.float32)
    aw = rng.uniform(size=(B, Q, H, L, P)).astype(np.float32)
    aw = aw / aw.reshape(B, Q, H, -1).sum(-1)[..., None, None]
    return value, loc, aw


@pytest.mark.parametrize("backend", ["gather", "matmul", "matmul_acc"])
def test_core_matches_grid_sample(backend):
    value, loc, aw = make_inputs()
    expected = torch_oracle(value, SHAPES, loc, aw)
    got = ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw), backend=backend
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", ["gather", "matmul", "matmul_acc"])
def test_core_boundary_locations(backend):
    """Exact boundary coordinates: 0, 1, and far out of range (border clamp)."""
    value, loc, aw = make_inputs(seed=1)
    loc = np.zeros_like(loc)
    loc[:, 0] = 0.0
    loc[:, 1] = 1.0
    loc[:, 2] = -3.7
    loc[:, 3] = 4.2
    loc[:, 4] = 0.5
    expected = torch_oracle(value, SHAPES, loc, aw)
    got = ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw), backend=backend
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_backends_agree_larger():
    value, loc, aw = make_inputs(seed=2, B=3, H=4, Dh=8, Q=11, P=4)
    a = ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw), backend="gather"
    )
    b = ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw), backend="matmul"
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_gradients_match_torch():
    """Gradcheck analog: grads w.r.t. value, locations, weights vs torch autograd."""
    value, loc, aw = make_inputs(seed=3, B=1, H=2, Dh=2, Q=3, P=2, loc_range=(0.05, 0.95))

    vt = torch.from_numpy(value).requires_grad_(True)
    lt = torch.from_numpy(loc).requires_grad_(True)
    at = torch.from_numpy(aw).requires_grad_(True)

    def torch_fwd(vt, lt, at):
        B, S, H, Dh = vt.shape
        _, Q, _, L, P = lt.shape
        value_list = vt.split(list(SHAPES), dim=1)
        grids = 2 * lt - 1
        sampled = []
        for lid, T in enumerate(SHAPES):
            v = value_list[lid].flatten(2).transpose(1, 2).reshape(B * H, Dh, T).unsqueeze(-1)
            g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1).flatten(1, 2).reshape(B * H, 1, -1)
            g = torch.stack([-torch.ones_like(g), g], dim=-1)
            s = F.grid_sample(v, g, mode="bilinear", padding_mode="border", align_corners=False)
            sampled.append(s.reshape(B * H, Dh, Q, P))
        aw_t = at.transpose(1, 2).reshape(B * H, 1, Q, L * P)
        out = (torch.stack(sampled, dim=-2).flatten(-2) * aw_t).sum(-1)
        return out.view(B, H * Dh, Q).transpose(1, 2)

    out_t = torch_fwd(vt, lt, at)
    loss_t = (out_t**2).sum()
    loss_t.backward()

    def jax_loss(v, l, a, backend):
        out = ms_deform_attn_core(v, SHAPES, l, a, backend=backend)
        return (out**2).sum()

    for backend in ("gather", "matmul", "matmul_acc"):
        grads = jax.grad(jax_loss, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw), backend
        )
        np.testing.assert_allclose(
            np.asarray(grads[0]), vt.grad.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"{backend}: grad_value",
        )
        np.testing.assert_allclose(
            np.asarray(grads[1]), lt.grad.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"{backend}: grad_sampling_loc",
        )
        np.testing.assert_allclose(
            np.asarray(grads[2]), at.grad.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"{backend}: grad_attn_weight",
        )
