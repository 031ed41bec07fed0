"""Raw-video path end to end: synthetic decoder -> raw dataset -> collate ->
ViViT-backed regular DVC -> proposals + greedy captions (BASELINE config #4)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.data.raw_anet import (
    RawActivityNetDataset,
    collate_raw,
    synthetic_decoder,
)
from multimodal_feature_learning_tpu.data.vocab import build_vocab
from multimodal_feature_learning_tpu.models.regular_dvc import build_regular_model

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')

ANN = {
    f"v_{i}": {
        "duration": 10.0 + i,
        "timestamps": [[1.0, 4.0 + i], [5.0, 9.0]],
        "sentences": ["a man is running", "the dog jumps high"],
    }
    for i in range(2)
}


def test_raw_video_to_captions(tmp_path):
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ANN))
    vocab = build_vocab(ANN, min_freq=1)

    cfg = load_config_train()
    cfg.use_raw_videos = True
    cfg.use_differentiable_mask = False
    cfg.dvc.use_sparse_detr = False
    cfg.dvc.use_deformable_detr = False
    cfg.dvc.losses = ["labels", "segments", "captions"]
    cfg.dvc.d_model = 32
    cfg.dvc.num_queries = 4
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.decoder.depth = 1
    cfg.dvc.caption.d_model = 32
    cfg.dvc.caption.depth = 1
    cfg.dvc.caption.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = 4   # 4 frames
    cfg.dataset.activity_net.max_caption_len_all = 8
    cfg.dataset.activity_net.max_gt_target_segments = 3

    ds = RawActivityNetDataset(
        str(ann_path), synthetic_decoder(frame_size=32), vocab, is_training=False,
        video_rescale_len=4, num_mel_bins=16, audio_target_length=8,
        max_gt_target_segments=3, max_caption_len=8,
    )
    batch_np = collate_raw([ds[i] for i in range(len(ds))], vocab.pad_idx,
                           max_gt=3, max_caption_len=8)
    batch = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k in ("video_tensor", "video_mask", "durations", "gt_segments",
                 "gt_mask", "cap_tokens")
    }
    assert batch["video_tensor"].dtype == jnp.uint8

    model = build_regular_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx)
    # the ViViT proposal net consumes raw (B, T, H, W, C) frames directly
    params = model.init(jax.random.PRNGKey(0), batch)
    out, caps, indices, _, _ = model.forward_eval(params, batch, "one_by_one")
    caps = np.asarray(caps)
    assert caps.shape[0] == 2 * 3
    assert (caps[:, 0] == vocab.bos_idx).all()
    assert out["pred_segments"].shape == (2, 4, 2)