#!/bin/bash
# Supervises tools/train_proof.py (the r04 training proof): relaunches on
# stall (exit 9, internal watchdog) or crash; bumps the pinned pair
# capacity on exit 7 (persistent overflow). A tunnel stall therefore costs
# minutes (resume from the newest compact checkpoint), not the round.
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-/root/repo/.proofrun}
PIN=${PIN:-9437184}
ITERS=${ITERS:-40500}
GRAD=${GRAD:-0.0002}
LOG=$OUT/supervisor.log
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for attempt in $(seq 1 60); do
  echo "[supervisor] attempt $attempt pin=$PIN $(date)" >> "$LOG"
  timeout 21600 python tools/train_proof.py --out "$OUT" --iters "$ITERS" \
    --pin_pairs "$PIN" --grad_threshold "$GRAD" >> "$OUT/train.log" 2>&1
  rc=$?
  echo "[supervisor] exit $rc $(date)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "[supervisor] COMPLETE" >> "$LOG"
    exit 0
  fi
  if [ $rc -eq 7 ]; then PIN=$((PIN + 2097152)); fi
  sleep 20
done
echo "[supervisor] gave up after 60 attempts" >> "$LOG"
exit 1
