"""Raw video(+audio) ActivityNet dataset.

Behavioral spec: reference ``dataset/anet_with_raw_video.py`` /
``anet_with_raw_video_audio.py`` — decode the clip, temporally resample to
``video_rescale_len`` frames, resize/crop/normalize, compute the Kaldi
log-mel fbank from the waveform, drop clips with empty audio; same GT/caption
processing as the feature dataset.

TPU-native split of responsibilities: the host side only DECODES (a pluggable
``decoder`` callable; torchvision.io is absent from this image, so any
pyav/opencv/npz-backed callable works and a synthetic decoder is provided for
tests).  Resize/normalize/fbank run as jnp transforms that jit into the model
program (`data/video_transforms.py`, `data/audio.py`).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from .anet import ActivityNetDataset, FeatureBackend
from .audio import aframes_to_fbank_static
from .video_transforms import preprocess_clip, temporal_resample_nearest


def synthetic_decoder(frame_size: int = 128, fps: float = 4.0, sample_rate: int = 16000):
    """Deterministic fake decoder: (key, duration) -> (frames uint8 (T,H,W,3),
    waveform float32, sample_rate). Stands in for torchvision.io.read_video."""

    def decode(key: str, duration: float):
        import zlib

        # crc32: process-stable, unlike PYTHONHASHSEED-randomized hash()
        rng = np.random.default_rng(zlib.crc32(key.encode()))
        t = max(int(duration * fps), 2)
        frames = rng.integers(0, 255, size=(t, frame_size, frame_size, 3)).astype(np.uint8)
        wave = rng.normal(size=int(duration * sample_rate)).astype(np.float32) * 0.1
        return frames, wave, sample_rate

    return decode


def opencv_decoder(
    video_folder: str,
    audio_folder: str = "",
    extensions=(".mp4", ".mkv", ".webm", ".avi", ".mov"),
    max_frames: int = 0,
):
    """Real video decoder backed by OpenCV's bundled ffmpeg
    (import-guarded; torchvision.io/pyav are absent from this image).

    Matches reference anet_with_raw_video_audio.py:242-246: resolves
    ``video_folder/<key>.<ext>``, decodes all frames as RGB uint8. Audio:
    cv2 cannot demux audio tracks, so the waveform comes from an optional
    sidecar ``audio_folder/<key>.wav`` (stdlib wave reader); absent sidecar
    -> empty waveform, which drops the clip in the audio pipeline exactly
    like the reference's empty-audio branch (:248-250).

    Returns a decoder callable (key, duration) -> (frames, wave, sample_rate).
    """
    import cv2  # import-guarded at call time by the builder below

    def _resolve(folder: str, key: str, exts):
        import os

        for ext in exts:
            p = os.path.join(folder, key + ext)
            if os.path.exists(p):
                return p
        return None

    def decode(key: str, duration: float):
        path = _resolve(video_folder, key, extensions)
        if path is None:
            raise FileNotFoundError(f"no video file for {key!r} in {video_folder}")
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame[..., ::-1])  # BGR -> RGB
            if max_frames and len(frames) >= max_frames:
                break
        cap.release()
        if not frames:
            raise IOError(f"decoded 0 frames from {path}")
        frames = np.stack(frames).astype(np.uint8)

        wave_arr = np.zeros((0,), dtype=np.float32)
        sr = 16000
        if audio_folder:
            wav_path = _resolve(audio_folder, key, (".wav",))
            if wav_path is not None:
                import wave as wave_mod

                with wave_mod.open(wav_path, "rb") as w:
                    sr = w.getframerate()
                    n = w.getnframes()
                    width = w.getsampwidth()
                    data = w.readframes(n)
                    if width == 2:
                        raw = np.frombuffer(data, dtype="<i2").astype(np.float32)
                        raw /= 32768.0
                    elif width == 1:  # 8-bit PCM is unsigned per WAV spec
                        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                        raw = (raw - 128.0) / 128.0
                    elif width == 4:
                        raw = np.frombuffer(data, dtype="<i4").astype(np.float32)
                        raw /= 2147483648.0
                    else:
                        raise ValueError(
                            f"{wav_path}: unsupported WAV sample width "
                            f"{width} bytes (supported: 1, 2, 4)"
                        )
                    if w.getnchannels() > 1:
                        raw = raw.reshape(-1, w.getnchannels()).mean(axis=1)
                    wave_arr = raw
        return frames, wave_arr, sr

    return decode


def build_decoder(cfg_anet, with_audio: bool):
    """Pluggable decoder resolution: a real opencv backend when a raw video
    folder is configured and cv2 imports, else the synthetic decoder."""
    folder = getattr(cfg_anet, "raw_video_folder", "")
    if folder:
        try:
            return opencv_decoder(
                folder, audio_folder=getattr(cfg_anet, "raw_audio_folder", "")
            )
        except ImportError:
            pass
    return synthetic_decoder()


class RawActivityNetDataset(ActivityNetDataset):
    """Same annotation/caption handling as the feature dataset; emits raw
    frames + waveform instead of precomputed features."""

    def __init__(
        self,
        annotation_file: str,
        decoder: Callable,
        vocab,
        is_training: bool,
        video_rescale_len: int = 300,
        num_mel_bins: int = 128,
        audio_target_length: int = 64,
        with_audio: bool = True,
        **kwargs,
    ):
        super().__init__(
            annotation_file,
            FeatureBackend("", feature_dim=1),  # unused; keys come from decoder
            vocab,
            is_training,
            **kwargs,
        )
        self.decoder = decoder
        self.video_rescale_len = video_rescale_len
        self.num_mel_bins = num_mel_bins
        self.audio_target_length = audio_target_length
        self.with_audio = with_audio

    def __getitem__(self, idx: int) -> Optional[Dict]:
        base = super().__getitem__(idx)
        if base is None:
            return None
        key = base["key"]
        frames, wave, sr = self.decoder(key, base["duration"])
        if self.with_audio and (wave is None or len(wave) == 0):
            return None  # reference drops clips with empty audio (:248-258)

        frames = np.asarray(temporal_resample_nearest(frames, self.video_rescale_len))
        sample = dict(base)
        del sample["video_feature"]
        sample["raw_frames"] = frames  # (T, H, W, 3) uint8, preprocessed on device
        if self.with_audio:
            # static-shape fbank: one XLA compile for the whole dataset (the
            # dynamic variant recompiles per distinct wave length — per video)
            fb = aframes_to_fbank_static(
                np.asarray(wave), float(sr), self.num_mel_bins, self.audio_target_length
            )
            sample["audio_feature"] = np.asarray(fb)  # (target_len, mel)
        return sample


def collate_raw(
    samples: List[Optional[Dict]],
    pad_idx: int,
    max_gt: int = 10,
    max_caption_len: int = 20,
) -> Optional[Dict]:
    """Fixed-shape raw batch: frames (B, T, H, W, 3) uint8 + fbank
    (B, La, mel) + the standard GT/caption grid.  Frame normalization happens
    in-model (jitted) via `preprocess_clip`."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    B = len(samples)
    frames = np.stack([s["raw_frames"] for s in samples])  # (B, T, H, W, 3)
    T = frames.shape[1]
    mask = np.zeros((B, T), dtype=bool)  # temporal resample leaves no padding

    durations = np.array([s["duration"] for s in samples], dtype=np.float32)
    gt_segments = np.zeros((B, max_gt, 2), dtype=np.float32)
    gt_mask = np.zeros((B, max_gt), dtype=bool)
    cap_tokens = np.full((B, max_gt, max_caption_len), pad_idx, dtype=np.int32)
    keys, raw_captions, gt_timestamps = [], [], []
    for i, s in enumerate(samples):
        n = len(s["gt_timestamps"])
        for j, ts in enumerate(s["gt_timestamps"]):
            gt_segments[i, j] = (
                (ts[1] + ts[0]) / (2 * s["duration"]),
                (ts[1] - ts[0]) / s["duration"],
            )
        gt_mask[i, :n] = True
        for j, ids in enumerate(s["caption_tokens"]):
            cap_tokens[i, j, : len(ids)] = ids
        keys.append(s["key"])
        raw_captions.append(s["raw_captions"])
        gt_timestamps.append(s["gt_timestamps"])

    out = {
        "video_tensor": frames,  # raw uint8; model applies preprocess_clip
        "video_mask": mask,
        "durations": durations,
        "batch_valid": np.ones((B,), dtype=bool),
        "gt_segments": gt_segments,
        "gt_mask": gt_mask,
        "gt_labels": np.zeros((B, max_gt), dtype=np.int32),
        "cap_tokens": cap_tokens,
        "keys": keys,
        "raw_captions": raw_captions,
        "gt_timestamps": gt_timestamps,
    }
    if "audio_feature" in samples[0]:
        out["audio_tensor"] = np.stack([s["audio_feature"] for s in samples])
        out["audio_mask"] = np.zeros(out["audio_tensor"].shape[:2], dtype=bool)
    return out


def build_raw_dataset(split: str, cfg, vocab=None):
    """Raw-video analog of data.anet.build_dataset: resolve the split's
    annotation file, build/cache the vocab, attach the configured decoder
    (reference dataset/anet_with_raw_video_audio.py:404-451 builder)."""
    import json
    import os

    from .vocab import Vocab, build_vocab

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

    with_audio = len(cfg.dvc.input_modalities) == 2
    ds = RawActivityNetDataset(
        annotation_file,
        build_decoder(anet, with_audio),
        vocab,
        is_training=(split == "train"),
        video_rescale_len=anet.video_rescale_len,
        num_mel_bins=anet.num_mel_bins,
        audio_target_length=anet.audio_target_length,
        with_audio=with_audio,
        max_gt_target_segments=anet.max_gt_target_segments,
        max_caption_len=anet.max_caption_len_all,
        invalid_videos_json=anet.invalid_videos_json,
        for_testing=anet.for_testing,
        num_samples=anet.num_samples,
        num_classes=anet.num_classes,
        seed=cfg.seed,
    )
    return ds, vocab
