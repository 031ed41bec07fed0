"""Batch-padding invariance: the reference never pads the batch dimension
(engine.py iterates real batches only), so our fixed-shape batch padding
(data/anet.py collate_fixed pad_to_batch) must be loss-invariant — dummy rows
contribute nothing to any loss or normalizer."""

import json

import jax
import numpy as np
import pytest

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.data.anet import (
    ActivityNetDataset,
    FeatureBackend,
    collate_fixed,
)
from multimodal_feature_learning_tpu.data.loader import split_batch
from multimodal_feature_learning_tpu.data.vocab import build_vocab
from multimodal_feature_learning_tpu.models.criterion import (
    SetCriterion,
    build_weight_dict,
)
from multimodal_feature_learning_tpu.models.dvc import build_model


def small_cfg():
    cfg = load_config_train()
    cfg.batch_size = 4
    cfg.dvc.d_model = 64
    cfg.dvc.num_queries = 6
    cfg.dvc.detr.feature_dim = 64
    cfg.dvc.detr.d_model = 64
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.detr.enc_layers = 2
    cfg.dvc.detr.dec_layers = 2
    cfg.dvc.detr.transformer_ff_dim = 128
    cfg.dvc.detr.video_rescale_len = 24
    cfg.dvc.detr.num_feature_levels = 3
    cfg.dvc.caption.d_model = 64
    cfg.dvc.caption.depth = 2
    cfg.dvc.caption.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = 24
    cfg.dataset.activity_net.max_caption_len_all = 8
    cfg.dataset.activity_net.max_gt_target_segments = 4
    # dropout off: identical row-wise compute regardless of batch shape
    cfg.dvc.detr.transformer_dropout_prob = 0.0
    cap = cfg.dvc.caption
    cap.positional_embedding_dropout = 0.0
    cap.attention_dropout = 0.0
    cap.projection_dropout = 0.0
    cap.bridge_dropout = 0.0
    cap.mlp_dropout_1 = 0.0
    cap.mlp_dropout_2 = 0.0
    return cfg


def make_annotations(n=3, seed=0):
    rng = np.random.default_rng(seed)
    ann = {}
    words = ["a", "man", "is", "playing", "guitar", "dog", "runs"]
    for i in range(n):
        dur = float(rng.uniform(10, 60))
        k = int(rng.integers(1, 4))
        stamps, sents = [], []
        for _ in range(k):
            s = float(rng.uniform(0, dur * 0.7))
            e = float(rng.uniform(s + 0.5, dur))
            stamps.append([s, e])
            sents.append(" ".join(rng.choice(words, size=5)))
        ann[f"v_{i:04d}"] = {"duration": dur, "timestamps": stamps, "sentences": sents}
    return ann


@pytest.mark.slow
def test_padded_batch_losses_match_unpadded(tmp_path):
    cfg = small_cfg()
    ann = make_annotations(n=3)
    ann_path = tmp_path / "train.json"
    ann_path.write_text(json.dumps(ann))

    vocab = build_vocab(ann, min_freq=1)
    features = FeatureBackend("", feature_dim=cfg.dvc.detr.feature_dim, synthetic_len=40)
    dataset = ActivityNetDataset(
        str(ann_path), features, vocab, is_training=True,
        max_gt_target_segments=4, max_caption_len=8,
    )
    samples = [dataset[i] for i in range(3)]

    def collate(pad_to):
        return collate_fixed(
            list(samples), vocab.pad_idx, video_rescale_len=24,
            max_gt=4, max_caption_len=8, pad_to_batch=pad_to,
        )

    arrays_real, _ = split_batch(collate(0))       # B = 3, no dummy rows
    arrays_padded, _ = split_batch(collate(6))     # B = 6, 3 dummy rows
    assert arrays_padded["video_tensor"].shape[0] == 6
    assert arrays_padded["batch_valid"].sum() == 3

    model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx)
    params = model.init(jax.random.PRNGKey(0), arrays_real)
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts", "mask_prediction"],
        pad_idx=vocab.pad_idx, smoothing=cfg.dvc.smoothing,
    )

    def loss_fn(params, arrays):
        out, indices, indices_aux, memory_mask = model.forward_train(
            params, arrays, jax.random.PRNGKey(7)
        )
        losses = criterion(out, arrays, indices, indices_aux, memory_mask)
        total = sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)
        return total, losses

    def losses_and_grads(arrays):
        arrays = {k: jax.numpy.asarray(v) for k, v in arrays.items()}
        (total, losses), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params, arrays)
        losses = {k: float(v) for k, v in losses.items()}
        losses["loss"] = float(total)
        return losses, grads

    l_real, g_real = losses_and_grads(arrays_real)
    l_padded, g_padded = losses_and_grads(arrays_padded)

    assert set(l_real) == set(l_padded)
    for k in sorted(l_real):
        assert np.isfinite(l_padded[k]), f"{k} non-finite on padded batch"
        np.testing.assert_allclose(
            l_padded[k], l_real[k], rtol=2e-4, atol=2e-5,
            err_msg=f"loss {k} not invariant to batch padding",
        )

    # gradients must also be finite and padding-invariant (the engine trains
    # on padded final batches; reference semantics = unpadded)
    flat_real = jax.tree_util.tree_flatten_with_path(g_real)[0]
    flat_padded = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(g_padded)[0]
    }
    for path, v in flat_real:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        gp = flat_padded[name]
        assert np.all(np.isfinite(gp)), f"non-finite grad {name} on padded batch"
        np.testing.assert_allclose(
            gp, np.asarray(v), rtol=5e-3, atol=1e-5,
            err_msg=f"grad {name} not invariant to batch padding",
        )
