#!/bin/bash
# Reference-full-scale training: 134k molecules with REAL native
# published-basis integral features, division 10k/10k/rest and batch 32
# (the reference recipe scale, config.json:14-15 / trainer.py:22-27),
# through the round-4 host-RAM batch cache (assembly paid once, batches
# streamed via background device_put prefetch).
set -u
cd "$(dirname "$0")/.."
DATA=${1:-processed/synthq134k_6311.npz}
WD=${2:-runs/ref_scale_134k}
EPOCHS=${3:-20}
python train.py --data-npz "$DATA" --workdir "$WD" \
  --config configs/ref134k.json --epochs "$EPOCHS" \
  --layout blocked --standardize --scheduler plateau --pack-mixed \
  --atomref-fit --fused-update --cache-batches host \
  --feat-dtype float16 --ckpt-every 1 --auto-resume \
  --ckpt-after-epoch 0 >> "$WD.log" 2>&1
