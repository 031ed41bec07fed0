"""End-to-end CLI driver test: main.py trains + checkpoints, inference.py
restores + scores — both as real subprocesses on CPU at tiny dims.

Covers the reference's driver surface (main.py:110-168 epoch loop,
inference.py:112-121 eval-only entry) the way a user invokes it."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "dvc.d_model=64", "dvc.num_queries=6",
    "dvc.detr.feature_dim=64", "dvc.detr.d_model=64", "dvc.detr.num_heads=2",
    "dvc.detr.enc_layers=2", "dvc.detr.dec_layers=2",
    "dvc.detr.transformer_ff_dim=128", "dvc.detr.video_rescale_len=24",
    "dvc.detr.num_feature_levels=3",
    "dvc.caption.d_model=64", "dvc.caption.depth=2", "dvc.caption.num_heads=2",
    "dataset.activity_net.video_rescale_len=24",
    "dataset.activity_net.max_caption_len_all=8",
    "dataset.activity_net.max_gt_target_segments=4",
    "eval_rate=1", "checkpoint_rate=1", "print_freq=4",
]


def run(cmd, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/mfl_jax_cache_tests"
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, f"{cmd}\nSTDOUT:\n{r.stdout[-3000:]}\nSTDERR:\n{r.stderr[-3000:]}"
    return r


def test_main_then_inference(tmp_path):
    out_dir = tmp_path / "run"
    # cwd=tmp_path: the synthetic world lands in tmp_path/synthetic_anet and
    # is shared (same seed => same data/vocab) by both driver invocations
    run(
        [sys.executable, os.path.join(REPO, "main.py"), "--synthetic",
         "--epochs", "1", "--batch-size", "8", "--output-dir", str(out_dir),
         "--config-overrides", *TINY],
        cwd=str(tmp_path),
    )
    # training artifacts: per-epoch JSONL log + orbax checkpoint
    log = out_dir / "train_log.txt"
    assert log.exists()
    rec = json.loads(log.read_text().strip().splitlines()[-1])
    assert "train_loss" in rec and rec["epoch"] == 0
    ckpt = out_dir / "checkpoint"
    assert ckpt.is_dir()

    r = run(
        [sys.executable, os.path.join(REPO, "inference.py"), "--synthetic",
         "--resume", str(ckpt), "--batch-size", "8",
         "--config-overrides", *TINY],
        cwd=str(tmp_path),
    )
    # scored eval ran and reported finite stats
    assert "val stats:" in r.stdout
    assert "METEOR" in r.stdout or "loss" in r.stdout


def test_rate_zero_gating(tmp_path):
    """eval_rate=0 / checkpoint_rate=0 mean 'final-epoch eval only' /
    'rolling checkpoint only' — not modulo-by-zero crashes (main.py epoch
    loop; reference main.py:110-168 has no such mode)."""
    out_dir = tmp_path / "run0"
    tiny = [o for o in TINY
            if not o.startswith(("eval_rate=", "checkpoint_rate="))]
    run(
        [sys.executable, os.path.join(REPO, "main.py"), "--synthetic",
         "--epochs", "2", "--batch-size", "8", "--output-dir", str(out_dir),
         "--config-overrides", *tiny, "eval_rate=0", "checkpoint_rate=0",
         "lr_drop=0"],
        cwd=str(tmp_path),
    )
    # rolling checkpoint written, but no numbered per-epoch checkpoints kept
    assert (out_dir / "checkpoint").is_dir()
    numbered = [p for p in out_dir.iterdir() if p.name.startswith("checkpoint0")]
    assert numbered == []
    # eval ran exactly once, on the final epoch
    val_log = (out_dir / "val_log.txt").read_text().strip().splitlines()
    epochs = [json.loads(l)["epoch"] for l in val_log]
    assert epochs == [1]
