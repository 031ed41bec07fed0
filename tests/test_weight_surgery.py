"""Weight-surgery transplant end-to-end: a (synthetic) ViT checkpoint exported
as an npz weight dict flows through transplant_vit_to_vivit into a live ViViT
backbone, and the transplanted projection provably drives the features.

Matches reference models/load_weights.py:33-99 (central-frame/filter-inflation
tubelet init, positional-embedding repetition)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.models.backbones import (
    VideoVisionTransformer,
)
from multimodal_feature_learning_tpu.models.load_weights import (
    inflate_patch_kernel_to_tubelet,
    interpolate_pos_embed,
    repeat_pos_embed_for_frames,
    transplant_vit_to_vivit,
)

D, PS, PT = 32, 8, 1


def fake_vit_npz(rng, d=D, ps=PS, c=3):
    return {
        "patch_embed.proj.weight": rng.normal(size=(d, c, ps, ps)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 17, d)).astype(np.float32),
    }


def small_vivit(model_name="factorised encoder"):
    return VideoVisionTransformer(
        model_name=model_name, d_model=D, depth=1, temporal_depth=1,
        num_heads=2, spatial_patch_size=PS, temporal_patch_size=PT,
        max_tokens=64,
    )


def test_transplant_drives_features():
    rng = np.random.default_rng(0)
    model = small_vivit()
    frames = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)
    out_init = model.apply(params, frames)

    npz = fake_vit_npz(rng)
    params2 = transplant_vit_to_vivit(npz, params, num_frames=2,
                                      temporal_patch_size=PT)

    # the transplanted patch kernel is the ViT kernel in flax layout
    k = params2["params"]["token_embeddings_layer"]["project_to_patch"]["kernel"]
    assert k.shape == (PT, PS, PS, 3, D)
    np.testing.assert_array_equal(
        k[0], npz["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(
        params2["params"]["token_embeddings_layer"]["project_to_patch"]["bias"],
        npz["patch_embed.proj.bias"],
    )
    # spatial pos rows 0..16 replaced
    np.testing.assert_array_equal(
        params2["params"]["spatial_pos_embedding"][:, :17], npz["pos_embed"]
    )

    # the backbone still runs and the transplant changed its output
    out = model.apply(params2, frames)
    assert out.shape == out_init.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(out_init))

    # oracle: token embedding of the transplanted model == conv with the ViT
    # kernel (2x2 patch grid of a 16x16 frame, valid conv = patch matmul)
    patch = np.asarray(frames[0, 0, :PS, :PS, :])  # first patch of frame 0
    expected = patch.reshape(-1) @ npz["patch_embed.proj.weight"].transpose(
        2, 3, 1, 0
    ).reshape(-1, D) + npz["patch_embed.proj.bias"]
    tok = model.apply(
        params2, frames,
        method=lambda m, f: m.token_embeddings_layer(f),
    )  # (B, T, P, D) or (B, T', P, D)
    np.testing.assert_allclose(np.asarray(tok)[0, 0, 0], expected, rtol=2e-5, atol=2e-5)


def test_spatio_temporal_pos_tiling():
    rng = np.random.default_rng(1)
    model = small_vivit("spatio temporal attention")
    frames = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames)

    npz = fake_vit_npz(rng)
    params2 = transplant_vit_to_vivit(
        npz, params, num_frames=2, temporal_patch_size=PT,
        model_name="spatio temporal attention",
    )
    tiled = repeat_pos_embed_for_frames(npz["pos_embed"], 2)
    n = min(tiled.shape[1], params2["params"]["pos_embedding"].shape[1])
    np.testing.assert_array_equal(
        params2["params"]["pos_embedding"][:, :n], tiled[:, :n]
    )
    out = model.apply(params2, frames)
    assert np.isfinite(np.asarray(out)).all()


def test_filter_inflation_and_interp():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(D, 3, PS, PS)).astype(np.float32)
    tub = inflate_patch_kernel_to_tubelet(w, temporal_patch_size=2,
                                          method="filter inflation")
    assert tub.shape == (2, PS, PS, 3, D)
    np.testing.assert_allclose(tub[0], tub[1])
    np.testing.assert_allclose(tub.sum(0), w.transpose(2, 3, 1, 0), rtol=1e-6)

    tub_c = inflate_patch_kernel_to_tubelet(w, temporal_patch_size=3,
                                            method="central frame")
    assert (tub_c[0] == 0).all() and (tub_c[2] == 0).all()
    np.testing.assert_array_equal(tub_c[1], w.transpose(2, 3, 1, 0))

    pe = rng.normal(size=(1, 10, 4)).astype(np.float32)
    pe2 = interpolate_pos_embed(pe, 19)
    assert pe2.shape == (1, 19, 4)
    np.testing.assert_allclose(pe2[0, 0], pe[0, 0], rtol=1e-6)
    np.testing.assert_allclose(pe2[0, -1], pe[0, -1], rtol=1e-6)
    # x_out = linspace(0, 9, 19): x_out[1] = 0.5 (midpoint), x_out[2] = 1.0
    np.testing.assert_allclose(pe2[0, 1], (pe[0, 0] + pe[0, 1]) / 2, rtol=1e-5)
    np.testing.assert_allclose(pe2[0, 2], pe[0, 1], rtol=1e-5)
