#!/bin/bash
# Reference-full-scale training: 134k molecules with REAL native
# published-basis integral features, division 10k/10k/rest and batch 32
# (the reference recipe scale, config.json:14-15 / trainer.py:22-27),
# through the round-4 host-RAM batch cache (assembly paid once per
# process, batches streamed via background device_put prefetch).
#
# Round 5: --feat-dtype int8 (per-edge-scale quantization) halves the
# per-step wire bytes vs the round-4 fp16 run (82-96 ms/step was
# link-bound at ~5 MB/step; VERDICT r4 #8).
#
# RSS-guarded restart loop (run_flagship.sh pattern): the remote
# backend leaks host transfer buffers on re-transferring paths
# (observed OOM at 126 GB after ~5 epochs without the guard);
# --ckpt-every 1 + --auto-resume make each restart lose at most one
# epoch.
set -u
cd "$(dirname "$0")/.."
DATA=${1:-processed/synthq134k_6311.npz}
WD=${2:-runs/ref_scale_134k}
EPOCHS=${3:-60}
RSS_LIMIT_KB=${RSS_LIMIT_KB:-95000000}   # 95 GB

for attempt in $(seq 1 50); do
  python train.py --data-npz "$DATA" --workdir "$WD" \
    --config configs/ref134k.json --epochs "$EPOCHS" \
    --layout blocked --standardize --scheduler plateau --pack-mixed \
    --atomref-fit --fused-update --cache-batches host \
    --feat-dtype ${FEAT_DTYPE:-int8} --ckpt-every 1 --auto-resume \
    --ckpt-after-epoch 0 >> "$WD.log" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    RSS=$(ps -o rss= -p "$PID" 2>/dev/null | tr -d ' ')
    if [ -n "$RSS" ] && [ "$RSS" -gt "$RSS_LIMIT_KB" ]; then
      echo "attempt $attempt: RSS ${RSS}kB > limit, restarting" >> "$WD.log"
      kill "$PID"
    fi
    sleep 30
  done
  wait "$PID"; RC=$?
  echo "attempt $attempt exited rc=$RC" >> "$WD.log"
  [ "$RC" -eq 0 ] && break
  sleep 5
done
