#!/bin/bash
# Raw-family convergence run only (BASELINE configs #4+#5): RawMultimodalDVC,
# synthetic decode -> ViViT + AST backbones -> cross-modal sparse DVC, scored
# periodically through evaluation/anet_eval.py with beam-search eval.
# Same overrides as tools/run_family_convergence.sh's RAW_OVERRIDES; split out
# because the mm half already completed (runs_mm_conv.log).
set -u
cd "$(dirname "$0")/.."

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

outdir="runs/raw"
log="runs_raw_conv.log"
mkdir -p "$outdir"
for attempt in $(seq 1 12); do
  resume=()
  if [ -d "$outdir/checkpoint" ]; then resume=(--resume "$outdir/checkpoint"); fi
  echo "=== raw attempt $attempt $(date -u +%H:%M:%S) ===" >> "$log"
  python main.py --epochs 15 --batch-size 8 \
    --output-dir "$outdir" "${resume[@]}" \
    --config-overrides "${RAW_OVERRIDES[@]}" >> "$log" 2>&1
  if grep -q "Training done" "$log"; then break; fi
  sleep 5
done
python tools/summarize_family_runs.py || true
echo "raw family run complete $(date -u)"
