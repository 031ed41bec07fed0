#!/bin/bash
# Family-convergence evidence runs (BASELINE configs #3 and #5, VERDICT r2
# missing item 4): short real-annotation training runs for
#   (a) the feature video+audio MultimodalDVC with BiModalEncoder fusion, and
#   (b) RawMultimodalDVC (synthetic decode -> ViViT/AST backbones, reduced dims),
# each scored periodically through evaluation/anet_eval.py. Relaunch-on-exit
# loop mirrors the flagship convergence protocol (RSS watchdog exits cleanly
# at epoch boundaries; --resume continues).
#
# Usage: bash tools/run_family_convergence.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to finish before taking the TPU..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

MM_OVERRIDES=(
  dvc.input_modalities=video,audio
  dvc.use_bimodal_encoder=True
  use_differentiable_mask=False
  dataset.activity_net.train_subset=2000
  dataset.activity_net.val_subset=128
  eval_rate=5
  rss_restart_gb=80
)

RAW_OVERRIDES=(
  use_raw_videos=True
  dvc.input_modalities=video,audio
  use_differentiable_mask=False
  dvc.d_model=128 dvc.detr.feature_dim=128 dvc.detr.d_model=128
  dvc.detr.num_heads=4 dvc.detr.enc_layers=2 dvc.detr.dec_layers=2
  dvc.detr.transformer_ff_dim=512 dvc.detr.num_feature_levels=3
  dvc.detr.video_rescale_len=16
  dvc.caption.d_model=128 dvc.caption.depth=2 dvc.caption.num_heads=4
  dvc.vivit.depth=2 dvc.vivit.temporal_depth=1 dvc.vivit.num_heads=4
  dvc.ast.depth=2 dvc.ast.num_heads=4
  dataset.activity_net.video_rescale_len=16
  dataset.activity_net.num_mel_bins=16
  dataset.activity_net.audio_target_length=64
  dataset.activity_net.audio_rescale_len=7
  dataset.activity_net.train_subset=500
  dataset.activity_net.val_subset=64
  eval.val_mode=beam
  eval_rate=5
  rss_restart_gb=80
)

run_family () {
  local name="$1" epochs="$2" batch="$3" log="$4"; shift 4
  local outdir="runs/$name"
  mkdir -p "$outdir"
  for attempt in $(seq 1 12); do
    local resume=()
    if [ -d "$outdir/checkpoint" ]; then resume=(--resume "$outdir/checkpoint"); fi
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ===" >> "$log"
    python main.py --epochs "$epochs" --batch-size "$batch" \
      --output-dir "$outdir" "${resume[@]}" \
      --config-overrides "$@" >> "$log" 2>&1
    if grep -q "Training done" "$log"; then break; fi
    sleep 5
  done
}

mkdir -p runs/mm runs/raw
run_family mm 20 16 runs_mm_conv.log "${MM_OVERRIDES[@]}"
run_family raw 15 8 runs_raw_conv.log "${RAW_OVERRIDES[@]}"
python tools/summarize_family_runs.py || true
echo "family runs complete $(date -u)"
