"""BaseEncoder parity vs torch: Conv1d(k1/k3s2p1) + GroupNorm(32) pyramid,
nearest mask interpolation, sine+duration position embedding — same weights
pushed through torch ops must reproduce our flax outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_feature_learning_tpu.models.base_encoder import (
    BaseEncoder,
    interpolate_mask_nearest,
    pyramid_shapes,
)

B, T, DV, DM, L = 2, 24, 16, 64, 3


def build():
    enc = BaseEncoder(num_feature_levels=L, d_model=DM)
    rng = np.random.default_rng(0)
    vf = rng.normal(size=(B, T, DV)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    mask[1, 18:] = True
    dur = np.array([40.0, 25.0], dtype=np.float32)
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(vf), jnp.asarray(mask), jnp.asarray(dur)
    )
    return enc, params, vf, mask, dur


def torch_level(x_t, kernel, bias, scale, gn_bias, stride):
    """x_t: (B, C, T) torch; kernel flax layout (k, in, out)."""
    w = torch.from_numpy(np.asarray(kernel)).permute(2, 1, 0)  # (out, in, k)
    b = torch.from_numpy(np.asarray(bias))
    k = w.shape[-1]
    pad = 1 if k == 3 else 0
    y = F.conv1d(x_t, w, b, stride=stride, padding=pad)
    y = F.group_norm(
        y, 32, torch.from_numpy(np.asarray(scale)), torch.from_numpy(np.asarray(gn_bias)),
        eps=1e-5,
    )
    return y


def test_pyramid_matches_torch():
    enc, params, vf, mask, dur = build()
    srcs, masks, poses = enc.apply(
        params, jnp.asarray(vf), jnp.asarray(mask), jnp.asarray(dur)
    )
    p = params["params"]
    x_t = torch.from_numpy(vf).permute(0, 2, 1)  # (B, DV, T)

    # level 0: k1 conv on input
    y0 = torch_level(
        x_t, p["input_proj_0"]["kernel"], p["input_proj_0"]["bias"],
        p["gn_0"]["scale"], p["gn_0"]["bias"], stride=1,
    )
    np.testing.assert_allclose(
        np.asarray(srcs[0]), y0.permute(0, 2, 1).numpy(), rtol=2e-4, atol=2e-4
    )

    # level 1: k3 s2 conv on raw input; level 2: on level 1
    y1 = torch_level(
        x_t, p["input_proj_1"]["kernel"], p["input_proj_1"]["bias"],
        p["gn_1"]["scale"], p["gn_1"]["bias"], stride=2,
    )
    np.testing.assert_allclose(
        np.asarray(srcs[1]), y1.permute(0, 2, 1).numpy(), rtol=2e-4, atol=2e-4
    )
    y2 = torch_level(
        y1, p["input_proj_2"]["kernel"], p["input_proj_2"]["bias"],
        p["gn_2"]["scale"], p["gn_2"]["bias"], stride=2,
    )
    np.testing.assert_allclose(
        np.asarray(srcs[2]), y2.permute(0, 2, 1).numpy(), rtol=2e-4, atol=2e-4
    )

    assert tuple(s.shape[1] for s in srcs) == pyramid_shapes(T, L)


def test_mask_interp_matches_torch():
    mask = np.zeros((B, T), dtype=bool)
    mask[0, 17:] = True
    mask[1, 5:] = True
    for new in (12, 6, 5):
        expected = (
            F.interpolate(torch.from_numpy(mask)[None].float(), size=new)
            .bool()[0]
            .numpy()
        )
        got = np.asarray(interpolate_mask_nearest(jnp.asarray(mask), new))
        np.testing.assert_array_equal(got, expected)


def test_sine_pos_embed_matches_torch():
    """PositionEmbeddingVideoSine formula vs a direct torch evaluation
    (reference embedding_layers.py:202-227)."""
    enc, params, vf, mask, dur = build()
    srcs, masks, poses = enc.apply(
        params, jnp.asarray(vf), jnp.asarray(mask), jnp.asarray(dur)
    )
    F_half = DM // 2
    w = np.asarray(params["params"]["pos_embed"]["duration_embed_layer"]["kernel"])
    b = np.asarray(params["params"]["pos_embed"]["duration_embed_layer"]["bias"])

    m = torch.from_numpy(mask)
    not_mask = ~m
    x_embed = not_mask.cumsum(1).float()
    eps = 1e-6
    scale = 2 * np.pi
    x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * scale
    dim_t = torch.arange(F_half).float()
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="trunc") / F_half)
    pos_x = x_embed[:, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, 0::2].sin(), pos_x[:, :, 1::2].cos()), dim=3
    ).flatten(2)
    dur_vec = torch.zeros(B, F_half)
    for i, d in enumerate(dur):
        dur_vec[i, : int(d)] = 1
    dur_embed = dur_vec @ torch.from_numpy(w) + torch.from_numpy(b)
    dur_embed = dur_embed[:, None, :].expand_as(pos_x)
    expected = torch.cat((pos_x, dur_embed), dim=2).numpy()  # (B, T, DM)

    np.testing.assert_allclose(np.asarray(poses[0]), expected, rtol=2e-4, atol=2e-4)
