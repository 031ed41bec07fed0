"""Regular (vanilla-attention) DVC family + ViViT/AST backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model_forward import PAD, BOS, EOS, VOCAB, small_cfg, synthetic_batch
from multimodal_feature_learning_tpu.models.backbones import (
    AudioSpectrogramTransformer,
    VideoVisionTransformer,
)
from multimodal_feature_learning_tpu.models.criterion import SetCriterion, build_weight_dict
from multimodal_feature_learning_tpu.models.regular_dvc import build_regular_model


def reg_cfg():
    cfg = small_cfg()
    cfg.dvc.use_sparse_detr = False
    cfg.dvc.use_deformable_detr = False
    cfg.dvc.decoder.depth = 2
    cfg.dvc.losses = ["labels", "segments", "captions", "contexts"]
    return cfg


@pytest.mark.slow
def test_regular_dvc_train_and_eval():
    cfg = reg_cfg()
    model = build_regular_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=cfg.dvc.losses, pad_idx=PAD, smoothing=cfg.dvc.smoothing,
    )

    def loss_fn(p, b, r):
        out, idx, idxa, mm = model.forward_train(p, b, r)
        losses = criterion(out, b, idx, idxa, mm)
        return sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict), losses

    (total, losses), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))

    out, caps, *_ = model.forward_eval(params, batch, "one_by_one")
    assert out["pred_logits"].shape[-1] == cfg.dvc.num_classes + 1
    caps = np.asarray(caps)
    assert (caps[:, 0] == BOS).all()


@pytest.mark.parametrize(
    "mode,expected_tokens",
    [
        ("factorised encoder", 4),            # T'=4 frames
        ("spatio temporal attention", 4 * 4), # T'*P
        ("factorised self attention", 4),
        ("factorised dot product attention", 4),
    ],
)
def test_vivit_modes(mode, expected_tokens):
    model = VideoVisionTransformer(
        model_name=mode, d_model=32, depth=1, temporal_depth=1, num_heads=2,
        spatial_patch_size=16, temporal_patch_size=1, max_tokens=64,
    )
    frames = jnp.zeros((2, 4, 32, 32, 3))  # P = (32/16)^2 = 4 patches
    params = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(params, frames)
    assert out.shape == (2, expected_tokens, 32)


def test_ast_backbone():
    model = AudioSpectrogramTransformer(
        d_model=32, depth=1, num_heads=2, patch_size=16,
        frequency_stride=10, time_stride=10, max_tokens=256,
    )
    spec = jnp.zeros((2, 64, 128))  # (B, frames, mels)
    params = model.init(jax.random.PRNGKey(0), spec)
    out = model.apply(params, spec)
    assert out.shape[0] == 2 and out.shape[2] == 32
    assert out.shape[1] > 2  # cls + distill + patches
