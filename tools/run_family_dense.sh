#!/bin/bash
# Family-convergence evidence runs for the remaining two families:
#   dense   — UnimodalDeformableDVC (dvc.use_sparse_detr=False,
#             dvc.use_deformable_detr=True): dense deformable encoder, no
#             top-rho sparsification, refinement heads (BASELINE config #2's
#             encoder+proposal path trained end-to-end)
#   regular — RegularDVC (both flags False): vanilla cross-attn decoder over
#             frame features, no multi-scale pyramid
# Same protocol as tools/run_family_convergence.sh (real annotations,
# synthetic features, main.py end-to-end, resume loop, RSS watchdog).
# Usage: bash tools/run_family_dense.sh
set -u
cd "$(dirname "$0")/.."

DENSE_OVERRIDES=(
  dvc.use_sparse_detr=False
  dvc.use_deformable_detr=True
  use_differentiable_mask=False
  dataset.activity_net.train_subset=2000
  dataset.activity_net.val_subset=128
  eval_rate=5
  rss_restart_gb=80
)

REGULAR_OVERRIDES=(
  dvc.use_sparse_detr=False
  dvc.use_deformable_detr=False
  use_differentiable_mask=False
  dataset.activity_net.train_subset=2000
  dataset.activity_net.val_subset=128
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

mkdir -p runs/dense runs/regular
run_family dense 20 16 runs_dense_conv.log "${DENSE_OVERRIDES[@]}"
run_family regular 20 16 runs_regular_conv.log "${REGULAR_OVERRIDES[@]}"
echo "ALLDONE"
