"""Raw dataset, h5 backend, data tooling, checkpoint round-trip, observability."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_feature_learning_tpu.data.anet import ActivityNetDataset, FeatureBackend
from multimodal_feature_learning_tpu.data.raw_anet import (
    RawActivityNetDataset,
    collate_raw,
    synthetic_decoder,
)
from multimodal_feature_learning_tpu.data.vocab import build_vocab
from multimodal_feature_learning_tpu.utils.data_tools import (
    check_timestamps,
    get_invalid_ids,
    make_h5,
)
from multimodal_feature_learning_tpu.utils.observability import (
    device_memory_stats,
    grad_flow_stats,
    save_grad_flow,
)

ANN = {
    "v_a": {"duration": 12.0, "timestamps": [[0.0, 5.0], [6.0, 11.0]],
            "sentences": ["a man runs", "a dog barks"]},
    "v_b": {"duration": 8.0, "timestamps": [[1.0, 7.0]], "sentences": ["people dance"]},
    "v_bad": {"duration": 5.0, "timestamps": [[4.0, 2.0]], "sentences": ["broken"]},
}


def write_ann(tmp_path):
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ANN))
    return str(p)


def test_h5_backend_roundtrip(tmp_path):
    ann_path = write_ann(tmp_path)
    h5_path = make_h5(ann_path, str(tmp_path / "feats.h5"), num_tokens=16, feature_dim=8)
    fb = FeatureBackend(h5_path, feature_dim=8)
    assert "v_a" in fb
    x = fb.get("v_a")
    assert x.shape == (16, 8) and x.dtype == np.float32
    vocab = build_vocab(ANN, min_freq=1)
    ds = ActivityNetDataset(ann_path, fb, vocab, is_training=True, max_gt_target_segments=4)
    sample = ds[ds.keys.index("v_a")]
    assert sample["video_feature"].shape == (16, 8)


def test_check_timestamps_and_invalid_ids(tmp_path):
    ann_path = write_ann(tmp_path)
    bad = check_timestamps([ann_path])
    assert list(bad) == ["v_bad"]
    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    (vid_dir / "v_a.mp4").write_bytes(b"")
    invalid = get_invalid_ids([ann_path], str(vid_dir))
    assert "v_b" in invalid and "v_a" not in invalid


def test_raw_dataset_and_collate(tmp_path):
    ann_path = write_ann(tmp_path)
    vocab = build_vocab(ANN, min_freq=1)
    ds = RawActivityNetDataset(
        ann_path, synthetic_decoder(frame_size=64), vocab, is_training=True,
        video_rescale_len=8, num_mel_bins=16, audio_target_length=12,
        max_gt_target_segments=4, max_caption_len=8,
    )
    samples = [ds[i] for i in range(len(ds))]
    # v_bad has degenerate timestamps -> None
    assert sum(s is None for s in samples) == 1
    batch = collate_raw(samples, vocab.pad_idx, max_gt=4, max_caption_len=8)
    assert batch["video_tensor"].shape[:2] == (2, 8)
    assert batch["video_tensor"].dtype == np.uint8
    assert batch["audio_tensor"].shape == (2, 12, 16)
    assert batch["gt_mask"].sum() == 3


def test_checkpoint_roundtrip(tmp_path):
    from multimodal_feature_learning_tpu.config import load_config_train
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
        save_checkpoint,
    )

    cfg = load_config_train()
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    tx = make_optimizer(cfg, steps_per_epoch=5)
    state = create_train_state(params, tx)
    save_checkpoint(str(tmp_path), state, epoch=3, name="ckpt")
    restored = load_checkpoint(str(tmp_path / "ckpt"), state)
    assert restored["epoch"] == 3
    np.testing.assert_allclose(np.asarray(restored["state"].params["w"]), np.asarray(params["w"]))
    assert int(restored["state"].step) == 0


def test_grad_flow_and_memory_stats(tmp_path):
    grads = {"layer1": {"kernel": jnp.ones((3, 3)) * 0.5}, "bias": jnp.zeros((3,))}
    stats = grad_flow_stats(grads)
    assert stats["layer1/kernel"]["mean_abs"] == 0.5
    out = save_grad_flow(grads, str(tmp_path), step=7, plot=True)
    assert os.path.exists(tmp_path / "grad_flow_00000007.json")
    assert set(out) == {"layer1/kernel", "bias"}
    device_memory_stats()  # must not raise


def test_cli_list_override_and_audio_dataset_alias(tmp_path):
    """dvc.input_modalities=video,audio via the CLI override parser builds the
    audio feature backend (aliasing the video h5 like reference
    dataset/anet.py:72 when no audio h5 is configured) and samples carry
    audio features through the collate."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from main import apply_overrides

    from multimodal_feature_learning_tpu.config import load_config_train
    from multimodal_feature_learning_tpu.data.anet import build_dataset, collate_fixed

    ann = {
        f"v_{i}": {
            "duration": 20.0,
            "timestamps": [[1.0, 5.0], [6.0, 15.0]],
            "sentences": ["a man runs", "the dog jumps"],
        }
        for i in range(3)
    }
    (tmp_path / "train.json").write_text(json.dumps(ann))

    cfg = load_config_train()
    cfg = apply_overrides(cfg, ["dvc.input_modalities=video,audio",
                                "dataset.activity_net.audio_rescale_len=6"])
    assert cfg.dvc.input_modalities == ["video", "audio"]
    cfg.dataset.activity_net.anet_path = str(tmp_path)
    cfg.dataset.activity_net.vocab_file_path = ""
    cfg.dvc.detr.feature_dim = 16

    ds, vocab = build_dataset("train", cfg)
    sample = ds[0]
    assert "audio_feature" in sample and sample["audio_feature"].shape[1] == 16

    batch = collate_fixed(
        [ds[i] for i in range(3)], vocab.pad_idx, video_rescale_len=8,
        max_gt=3, max_caption_len=8, audio_rescale_len=6,
    )
    assert batch["audio_tensor"].shape == (3, 6, 16)
    assert batch["audio_mask"].shape == (3, 6)


def test_apply_overrides_list_coercion():
    """List overrides coerce elements to the default list's element type
    (eval.tious floats stay floats; string lists stay strings)."""
    from main import apply_overrides
    from multimodal_feature_learning_tpu.config import load_config_train

    cfg = load_config_train()
    apply_overrides(cfg, [
        "eval.tious=0.3,0.5",
        "dvc.input_modalities=video,audio",
        "dvc.detr.num_heads=4",
        "use_raw_videos=True",
    ])
    assert cfg.eval.tious == [0.3, 0.5]
    assert cfg.dvc.input_modalities == ["video", "audio"]
    assert cfg.dvc.detr.num_heads == 4
    assert cfg.use_raw_videos is True


def test_meteor_missing_synonym_file():
    """An explicitly-passed missing synonym table must raise, not silently
    score without the synonymy stage."""
    import pytest as _pytest

    from multimodal_feature_learning_tpu.evaluation.metrics.meteor import Meteor

    with _pytest.raises(FileNotFoundError):
        Meteor(synonym_file="/nonexistent/synsets.txt")
