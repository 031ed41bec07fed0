"""Real video ingestion: encode tiny clips with OpenCV, decode them through
the opencv_decoder backend -> RawActivityNetDataset -> collate_raw.

Matches reference anet_with_raw_video_audio.py:229-260 (torchvision.io decode
with empty-audio drop); the backend here is OpenCV's bundled ffmpeg, with wav
sidecars for audio (cv2 cannot demux audio tracks)."""

import json
import wave as wave_mod

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multimodal_feature_learning_tpu.data.raw_anet import (  # noqa: E402
    RawActivityNetDataset,
    collate_raw,
    opencv_decoder,
)
from multimodal_feature_learning_tpu.data.vocab import build_vocab  # noqa: E402

ANN = {
    f"v_clip{i}": {
        "duration": 2.0,
        "timestamps": [[0.2, 1.0], [1.0, 1.8]],
        "sentences": ["a man is running", "the dog jumps high"],
    }
    for i in range(2)
}


def write_clip(path, n_frames=8, size=64, level_step=30):
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 4.0, (size, size)
    )
    assert w.isOpened(), "opencv has no usable encoder in this image"
    for i in range(n_frames):
        w.write(np.full((size, size, 3), i * level_step, np.uint8))
    w.release()


def write_wav(path, sr=16000, seconds=2.0, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    pcm = (np.sin(2 * np.pi * freq * t) * 0.3 * 32767).astype(np.int16)
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


@pytest.fixture()
def media(tmp_path):
    vdir = tmp_path / "videos"
    adir = tmp_path / "audio"
    vdir.mkdir()
    adir.mkdir()
    for key in ANN:
        write_clip(vdir / f"{key}.avi")
        write_wav(adir / f"{key}.wav")
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ANN))
    return vdir, adir, ann_path


def test_decode_roundtrip(media):
    vdir, adir, _ = media
    decode = opencv_decoder(str(vdir), audio_folder=str(adir))
    frames, wave, sr = decode("v_clip0", 2.0)
    assert frames.shape == (8, 64, 64, 3) and frames.dtype == np.uint8
    # MJPG is lossy but the constant gray levels survive within a few counts
    means = frames.reshape(8, -1).mean(axis=1)
    assert np.all(np.abs(means - np.arange(8) * 30) < 6), means
    assert sr == 16000 and wave.shape == (32000,)
    assert np.abs(wave).max() > 0.2  # the sine came through


def test_dataset_and_collate_with_real_decoder(media):
    vdir, adir, ann_path = media
    vocab = build_vocab(ANN, min_freq=1)
    ds = RawActivityNetDataset(
        str(ann_path), opencv_decoder(str(vdir), audio_folder=str(adir)),
        vocab, is_training=True, video_rescale_len=4,
        num_mel_bins=16, audio_target_length=8,
        max_gt_target_segments=3, max_caption_len=8,
    )
    samples = [ds[i] for i in range(len(ds))]
    batch = collate_raw(samples, vocab.pad_idx, max_gt=3, max_caption_len=8)
    assert batch["video_tensor"].shape == (2, 4, 64, 64, 3)
    assert batch["video_tensor"].dtype == np.uint8
    assert batch["audio_tensor"].shape == (2, 8, 16)
    assert np.isfinite(batch["audio_tensor"]).all()
    assert batch["gt_mask"].sum() == 4


def test_missing_video_raises(media):
    vdir, _, _ = media
    decode = opencv_decoder(str(vdir))
    with pytest.raises(FileNotFoundError, match="v_nope"):
        decode("v_nope", 1.0)


def test_no_audio_sidecar_drops_clip_in_audio_pipeline(media):
    vdir, _, ann_path = media
    vocab = build_vocab(ANN, min_freq=1)
    ds = RawActivityNetDataset(
        str(ann_path), opencv_decoder(str(vdir)),  # no audio folder
        vocab, is_training=True, video_rescale_len=4,
        num_mel_bins=16, audio_target_length=8,
        max_gt_target_segments=3, max_caption_len=8, with_audio=True,
    )
    # empty waveform -> clip dropped, mirroring the reference's empty-audio
    # branch (anet_with_raw_video_audio.py:248-250)
    assert ds[0] is None
