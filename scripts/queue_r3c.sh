#!/bin/bash
# Round-3 TPU queue, phase 3: batched-merge A/B control + walk saturation.
# Usage: nohup bash scripts/queue_r3c.sh <pid-of-phase-2> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue3: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "queue3: 400M per-pair control (batchmerges=0)  $(date)"
BWTB3M_BATCHMERGES=0 python scripts/build_big.py 400 128 /root/bigbuild \
  > logs/build_400_perpair.log 2>&1 || echo "queue3: 400 per-pair FAILED"

echo "queue3: walk ladder high lanes  $(date)"
python scripts/bench_walk.py 16777216 262144 2048 \
  > logs/walk_hilanes.log 2>&1 || echo "queue3: walk hi FAILED"
python scripts/bench_walk.py 16777216 524288 1024 \
  >> logs/walk_hilanes.log 2>&1 || true

echo "queue3: done $(date)"
