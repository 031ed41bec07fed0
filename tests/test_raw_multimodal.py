"""BASELINE config #5: full raw video+audio DVC — pixels + log-mel -> ViViT +
AST backbones -> cross-modal sparse encoder -> proposals + greedy captions,
one jitted program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.data.audio import aframes_to_fbank
from multimodal_feature_learning_tpu.models.multimodal import build_multimodal_model

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')

VOCAB, PAD, BOS, EOS = 50, 1, 2, 3


def test_raw_multimodal_end_to_end():
    T_FRAMES = 8          # ViViT 'factorised encoder' emits one token/frame
    N_MELS = 16
    SPEC_FRAMES = 64      # AST tokens: floor((64-16)/10)+1 = 5, +2 = 7
    AST_TOKENS = 7

    cfg = load_config_train()
    cfg.use_raw_videos = True
    cfg.use_differentiable_mask = False
    cfg.dvc.input_modalities = ["video", "audio"]
    cfg.dvc.losses = ["labels", "segments", "captions"]
    cfg.dvc.d_model = 32
    cfg.dvc.num_queries = 4
    cfg.dvc.detr.d_model = 32
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.detr.enc_layers = 1
    cfg.dvc.detr.dec_layers = 1
    cfg.dvc.detr.transformer_ff_dim = 64
    cfg.dvc.detr.num_feature_levels = 2
    cfg.dvc.detr.video_rescale_len = T_FRAMES
    cfg.dvc.caption.d_model = 32
    cfg.dvc.caption.depth = 1
    cfg.dvc.caption.num_heads = 2
    cfg.dvc.vivit.depth = 1
    cfg.dvc.vivit.temporal_depth = 1
    cfg.dvc.vivit.num_heads = 2
    cfg.dvc.ast.depth = 1
    cfg.dvc.ast.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = T_FRAMES
    cfg.dataset.activity_net.audio_rescale_len = AST_TOKENS
    cfg.dataset.activity_net.max_caption_len_all = 6
    cfg.dataset.activity_net.max_gt_target_segments = 2

    rng = np.random.default_rng(0)
    B, G, Lc = 2, 2, 6
    frames = rng.integers(0, 255, size=(B, T_FRAMES, 32, 32, 3)).astype(np.uint8)
    wave = rng.normal(size=int(16000 * 0.67)).astype(np.float32)
    fbank = np.asarray(aframes_to_fbank(jnp.asarray(wave), 16000.0, N_MELS, SPEC_FRAMES))
    spec = np.stack([fbank, fbank * 0.5])  # (B, 64, 16)

    batch = {
        "video_tensor": jnp.asarray(frames),
        "video_mask": jnp.zeros((B, T_FRAMES), dtype=bool),
        "audio_tensor": jnp.asarray(spec),
        "audio_mask": jnp.zeros((B, SPEC_FRAMES), dtype=bool),
        "durations": jnp.asarray([20.0, 35.0]),
        "gt_segments": jnp.asarray(
            rng.uniform(0.2, 0.7, size=(B, G, 2)).astype(np.float32)
        ),
        "gt_mask": jnp.ones((B, G), dtype=bool),
        "cap_tokens": jnp.asarray(
            np.concatenate(
                [
                    np.full((B, G, 1), BOS, np.int32),
                    rng.integers(4, VOCAB, size=(B, G, Lc - 2)).astype(np.int32),
                    np.full((B, G, 1), EOS, np.int32),
                ],
                axis=2,
            )
        ),
    }

    model = build_multimodal_model(cfg, VOCAB, PAD, BOS, EOS)
    assert type(model).__name__ == "RawMultimodalDVC"
    params = model.init(jax.random.PRNGKey(0), batch)
    out, caps, indices, _, _ = jax.jit(
        lambda p, b: model.forward_eval(p, b, "one_by_one")
    )(params, batch)
    caps = np.asarray(caps)
    assert caps.shape == (B * G, Lc + 1)
    assert (caps[:, 0] == BOS).all()
    assert out["pred_segments"].shape == (B, 4, 2)

    # training gradients flow into the backbones too
    def loss(p):
        o, idx, idxa, mm = model.forward_train(p, batch, jax.random.PRNGKey(1))
        return o["pred_captions"].sum() + o["pred_segments"].sum()

    grads = jax.grad(loss)(params)
    g_vivit = jax.tree_util.tree_leaves(grads["video_backbone"])
    g_ast = jax.tree_util.tree_leaves(grads["audio_backbone"])
    assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in g_vivit)
    assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in g_ast)