#!/bin/bash
# Round-5 gap (intensive/molwise) experiments, VERDICT r4 #9: separate
# "hard label" from "recipe deficiency" on the HOMO-LUMO-gap target.
#  arm A (50k, 200 epochs, dropout 0.1, patience 6): recipe levers
#  arm B (25k, 120 epochs, same recipe): data-scaling point — if A and
#  B saturate at the same val MAE, the limit is the label (random
#  geometries -> near-degeneracy-dominated gaps), not the data budget.
set -u
cd "$(dirname "$0")/.."
ARM=${1:-A}
if [ "$ARM" = "A" ]; then
  DATA=processed/synthq50k_6311.npz; WD=runs/gap_r5_50k; EPOCHS=200
else
  DATA=processed/synthq25k_6311.npz; WD=runs/gap_r5_25k; EPOCHS=120
fi
python train.py --data-npz "$DATA" --workdir "$WD" \
  --config configs/flagship_synthq.json --target 4 --epochs "$EPOCHS" \
  --layout blocked --standardize --scheduler plateau --pack-mixed \
  --fused-update --dropout 0.1 --patience 6 \
  --cache-batches on --feat-dtype float16 \
  --ckpt-every 1 --auto-resume --ckpt-after-epoch 0 >> "$WD.log" 2>&1
