#!/bin/bash
# Intensive-target (HOMO-LUMO-gap) training: the reference's target->model
# dispatch sends intensive targets 0-5 to the global/MolWise model
# (train_ema.py:41-44). Uses the round-4 native6311 synthetic dataset's
# second label column (gap, eV — synthetic.independent_particle_labels).
set -u
cd "$(dirname "$0")/.."
DATA=${1:-processed/synthq50k_6311.npz}
WD=${2:-runs/gap_molwise_r4}
EPOCHS=${3:-60}
python train.py --data-npz "$DATA" --workdir "$WD" \
  --config configs/flagship_synthq.json --target 4 --epochs "$EPOCHS" \
  --layout blocked --standardize --scheduler plateau --pack-mixed \
  --fused-update --cache-batches on --feat-dtype float16 \
  --ckpt-every 1 --auto-resume --ckpt-after-epoch 0 >> "$WD.log" 2>&1
