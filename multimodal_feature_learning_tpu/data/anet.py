"""ActivityNet Captions dataset on precomputed features + fixed-shape collate.

Behavioral spec: reference ``dataset/anet_video.py`` —
  * ``__getitem__`` (:143-194): skip degenerate timestamps, cap GT segments at
    ``max_gt_target_segments`` with a random subset, tokenize captions to
    ``<bos> ... <eos>`` (truncated to max_caption_len_all), keep raw metadata.
  * ``collate_fn`` (:262-384): zero-pad videos to the batch max, build masks,
    normalize GT segments to (center, length), then nearest-interpolate the
    padded batch (features + mask) to ``video_rescale_len``.

Static-shape deltas (TPU-first):
  * captions are laid out as a fixed (B, max_gt, max_caption_len) grid gated
    by ``gt_mask`` instead of the dynamic flattened ``total_caption_num`` rows;
    the models consume exactly this grid.
  * everything is numpy on the host; batches are plain dicts of arrays ready
    to be device_put with a data-axis sharding.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from .vocab import Vocab, build_vocab, word_tokenize


def nearest_resize(x: np.ndarray, new_size: int, axis: int = 1) -> np.ndarray:
    """torch ``F.interpolate(mode='nearest')`` semantics:
    out[i] = in[floor(i * T_in / T_out)] (reference anet_video.py:246-256)."""
    t_in = x.shape[axis]
    idx = (np.arange(new_size) * t_in) // new_size
    return np.take(x, idx, axis=axis)


class FeatureBackend:
    """Feature source: an h5 file of (num_tokens, feature_dim) per video id,
    or a deterministic synthetic generator (the reference's make_h5.py fixture
    pattern, utils/make_h5.py:1-21)."""

    def __init__(self, h5_path: str = "", feature_dim: int = 512, synthetic_len: int = 64):
        self.h5 = None
        self.feature_dim = feature_dim
        self.synthetic_len = synthetic_len
        if h5_path:
            import h5py

            self.h5 = h5py.File(h5_path, "r")

    def __contains__(self, key: str) -> bool:
        return True if self.h5 is None else key in self.h5

    def get(self, key: str) -> np.ndarray:
        if self.h5 is not None:
            return np.asarray(self.h5[key]).astype(np.float32)
        # crc32, NOT hash(): Python string hashing is randomized per process
        # (PYTHONHASHSEED), which would give every jax.distributed worker —
        # and every rerun — different synthetic features
        import zlib

        rng = np.random.default_rng(zlib.crc32(key.encode()))
        return rng.normal(size=(self.synthetic_len, self.feature_dim)).astype(np.float32)


class ActivityNetDataset:
    def __init__(
        self,
        annotation_file: str,
        features: FeatureBackend,
        vocab: Vocab,
        is_training: bool,
        max_gt_target_segments: int = 10,
        max_caption_len: int = 20,
        invalid_videos_json: str = "",
        for_testing: bool = False,
        num_samples: int = 6,
        num_classes: int = 200,
        seed: int = 0,
        audio_features: Optional["FeatureBackend"] = None,
    ):
        with open(annotation_file) as f:
            self.annotation = json.load(f)
        invalid = set()
        if invalid_videos_json and os.path.exists(invalid_videos_json):
            with open(invalid_videos_json) as f:
                invalid = set(json.load(f))
        self.keys = [
            k for k in self.annotation.keys() if k not in invalid and k in features
        ]
        if for_testing:
            self.keys = self.keys[:num_samples]
        self.features = features
        self.audio_features = audio_features
        self.vocab = vocab
        self.is_training = is_training
        self.max_gt = max_gt_target_segments
        self.max_caption_len = max_caption_len
        self.num_classes = num_classes
        self.base_seed = seed
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, idx: int) -> Optional[Dict]:
        key = self.keys[idx]
        ann = self.annotation[key]
        for ts in ann["timestamps"]:
            if ts[0] >= ts[1]:
                return None  # degenerate GT (anet_video.py:164-166)

        duration = float(ann["duration"])
        captions = list(ann["sentences"])
        gt_timestamps = [list(ts) for ts in ann["timestamps"]]
        action_labels = list(ann.get("classes", [0] * len(gt_timestamps)))

        n = min(len(gt_timestamps), self.max_gt)
        if self.is_training:
            rng = self.rng  # fresh subset every epoch (reference random.sample)
        else:
            # eval: per-key deterministic subset — sample content must not
            # depend on iteration order or pass count (the quality-comparison
            # harness iterates the val loader once per system)
            import zlib

            rng = np.random.default_rng((zlib.crc32(key.encode()), self.base_seed))
        chosen = rng.choice(len(gt_timestamps), n, replace=False)
        chosen_set = set(int(c) for c in chosen)
        keep = [i for i in range(len(gt_timestamps)) if i in chosen_set]
        captions = [captions[i] for i in keep]
        gt_timestamps = [gt_timestamps[i] for i in keep]
        action_labels = [action_labels[i] for i in keep]

        caption_tokens = []
        for caption in captions:
            ids = [self.vocab[t] for t in word_tokenize(caption.lower())]
            ids = [self.vocab.bos_idx] + ids[: self.max_caption_len - 2] + [self.vocab.eos_idx]
            caption_tokens.append(ids)

        sample_audio = {}
        if self.audio_features is not None:
            sample_audio["audio_feature"] = self.audio_features.get(key)
        return {
            "key": key,
            "video_feature": self.features.get(key),  # (num_tokens, D)
            **sample_audio,
            "duration": duration,
            "gt_timestamps": gt_timestamps,      # [n, 2] seconds
            "action_labels": action_labels,      # [n]
            "caption_tokens": caption_tokens,    # [n, <=Lc]
            "raw_captions": captions,            # [n]
        }


def collate_fixed(
    samples: List[Optional[Dict]],
    pad_idx: int,
    video_rescale_len: int = 300,
    max_gt: int = 10,
    max_caption_len: int = 20,
    pad_to_batch: int = 0,
    audio_rescale_len: int = 0,
) -> Optional[Dict]:
    """Fixed-shape batch dict. ``pad_to_batch`` pads the batch dimension with
    zero-masked dummy videos so every step has identical shapes (no recompiles).

    Returns arrays:
      video_tensor (B, T, D) f32 | video_mask (B, T) bool True=pad
      durations (B,) f32 | batch_valid (B,) bool
      gt_segments (B, G, 2) f32 (center, length) | gt_mask (B, G) bool
      gt_labels (B, G) i32 | cap_tokens (B, G, Lc) i32
    plus host-side metadata lists: keys, raw_captions, gt_timestamps.
    """
    from .. import native

    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    n_real = len(samples)
    B = max(n_real, pad_to_batch)
    D = samples[0]["video_feature"].shape[1]
    max_len = max(s["video_feature"].shape[0] for s in samples)

    video = np.zeros((B, max_len, D), dtype=np.float32)
    mask = np.ones((B, max_len), dtype=bool)
    # dummy rows (batch padding) are full-length valid zero videos, NOT fully
    # padded rows: a fully-masked row creates degenerate intermediates
    # (valid_ratio=0 divisions, all-masked softmaxes) whose backward emits NaN
    # even though the criterion masks the loss. Finite forward => zero, finite
    # gradients for dummy rows (their loss cotangents are exactly 0).
    mask[n_real:] = False
    durations = np.ones((B,), dtype=np.float32)
    gt_segments = np.zeros((B, max_gt, 2), dtype=np.float32)
    gt_mask = np.zeros((B, max_gt), dtype=bool)
    gt_labels = np.zeros((B, max_gt), dtype=np.int32)
    cap_tokens = np.full((B, max_gt, max_caption_len), pad_idx, dtype=np.int32)
    keys, raw_captions, gt_timestamps = [], [], []

    for i, s in enumerate(samples):
        L = s["video_feature"].shape[0]
        video[i, :L] = s["video_feature"]
        mask[i, :L] = False
        durations[i] = s["duration"]
        n = len(s["gt_timestamps"])
        for j, ts in enumerate(s["gt_timestamps"]):
            c = (ts[1] + ts[0]) / (2 * s["duration"])
            l = (ts[1] - ts[0]) / s["duration"]
            gt_segments[i, j] = (c, l)
        gt_mask[i, :n] = True
        gt_labels[i, :n] = s["action_labels"]
        for j, ids in enumerate(s["caption_tokens"]):
            cap_tokens[i, j, : len(ids)] = ids
        keys.append(s["key"])
        raw_captions.append(s["raw_captions"])
        gt_timestamps.append(s["gt_timestamps"])

    # reference order: pad to batch max, then nearest-rescale tensor AND mask.
    # native C++ path fuses pad+resize+mask for the threaded collate hot loop.
    if native.available():
        video = native.resize_nearest(video, video_rescale_len)
        mask = native.resize_nearest(mask, video_rescale_len)
    else:
        video = nearest_resize(video, video_rescale_len, axis=1)
        mask = nearest_resize(mask, video_rescale_len, axis=1)

    audio = audio_mask = None
    if audio_rescale_len and "audio_feature" in samples[0]:
        Da = samples[0]["audio_feature"].shape[1]
        a_max = max(s["audio_feature"].shape[0] for s in samples)
        audio = np.zeros((B, a_max, Da), dtype=np.float32)
        audio_mask = np.ones((B, a_max), dtype=bool)
        audio_mask[n_real:] = False  # dummy rows: valid zero audio (see above)
        for i, s in enumerate(samples):
            La = s["audio_feature"].shape[0]
            audio[i, :La] = s["audio_feature"]
            audio_mask[i, :La] = False
        audio = nearest_resize(audio, audio_rescale_len, axis=1)
        audio_mask = nearest_resize(audio_mask, audio_rescale_len, axis=1)

    batch_valid = np.zeros((B,), dtype=bool)
    batch_valid[:n_real] = True

    if audio is not None:
        return {
            "video_tensor": video,
            "video_mask": mask,
            "audio_tensor": audio,
            "audio_mask": audio_mask,
            "durations": durations,
            "batch_valid": batch_valid,
            "gt_segments": gt_segments,
            "gt_mask": gt_mask,
            "gt_labels": gt_labels,
            "cap_tokens": cap_tokens,
            "keys": keys,
            "raw_captions": raw_captions,
            "gt_timestamps": gt_timestamps,
        }
    return {
        "video_tensor": video,
        "video_mask": mask,
        "durations": durations,
        "batch_valid": batch_valid,
        "gt_segments": gt_segments,
        "gt_mask": gt_mask,
        "gt_labels": gt_labels,
        "cap_tokens": cap_tokens,
        "keys": keys,
        "raw_captions": raw_captions,
        "gt_timestamps": gt_timestamps,
    }


def build_dataset(split: str, cfg, vocab: Optional[Vocab] = None):
    """Reference build_dataset (anet_video.py:404-451): resolve annotation
    file per split, build/cache the vocab from the train split."""
    anet = cfg.dataset.activity_net
    fname = {
        "train": "train.json",
        "val": "val_data_1_with_action_classes.json",
        "test": "val_data_2.json",
    }[split]
    annotation_file = os.path.join(anet.anet_path, fname)

    if vocab is None:
        vpath = anet.vocab_file_path
        if vpath and os.path.exists(vpath):
            vocab = Vocab.load(vpath)
        else:
            with open(os.path.join(anet.anet_path, "train.json")) as f:
                train_ann = json.load(f)
            vocab = build_vocab(train_ann, anet.min_freq)
            if vpath:
                vocab.save(vpath)

    features = FeatureBackend(
        anet.video_features_file, feature_dim=cfg.dvc.detr.feature_dim
    )
    audio_features = None
    if len(cfg.dvc.input_modalities) == 2:
        # reference dataset/anet.py:72 aliases the audio h5 to the video h5
        # (no audio feature file ships); same here, with its own backend so a
        # real audio h5 drops in via anet.audio_features_file when present
        audio_path = getattr(anet, "audio_features_file", "") or anet.video_features_file
        audio_features = FeatureBackend(
            audio_path, feature_dim=cfg.dvc.detr.feature_dim
        )
    ds = ActivityNetDataset(
        annotation_file,
        features,
        vocab,
        audio_features=audio_features,
        is_training=(split == "train"),
        max_gt_target_segments=anet.max_gt_target_segments,
        max_caption_len=anet.max_caption_len_all,
        invalid_videos_json=anet.invalid_videos_json,
        for_testing=anet.for_testing,
        num_samples=anet.num_samples,
        num_classes=anet.num_classes,
        seed=cfg.seed,
    )
    return ds, vocab
