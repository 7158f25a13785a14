#!/bin/bash
# Round-3 TPU queue, phase 4: true steady-state 400M batched build
# (every batched shape compiled by the earlier runs) + 100M merge point.
# Usage: nohup bash scripts/queue_r3d.sh <pid-of-phase-3> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue4: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "queue4: 400M batched steady rerun  $(date)"
python scripts/build_big.py 400 128 /root/bigbuild \
  > logs/build_400_steady2.log 2>&1 || echo "queue4: 400 rerun FAILED"

echo "queue4: 100M batched (4x 25M blocks)  $(date)"
python scripts/build_big.py 100 25 /root/bigbuild \
  > logs/build_100_batched.log 2>&1 || echo "queue4: 100 FAILED"

echo "queue4: done $(date)"
