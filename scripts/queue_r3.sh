#!/bin/bash
# Round-3 TPU work queue: runs after the in-flight 2200 Mbp build exits.
# Usage: nohup bash scripts/queue_r3.sh <pid-to-wait-for> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "queue: 3200 flagship build  $(date)"
python scripts/build_big.py 3200 128 /root/bigbuild \
  > logs/build_3200.log 2>&1 || echo "queue: 3200 FAILED"

echo "queue: 400M steady-state    $(date)"
python scripts/build_big.py 400 128 /root/bigbuild \
  > logs/build_400_steady.log 2>&1 || echo "queue: 400 FAILED"

echo "queue: PLCP 400M            $(date)"
python scripts/bench_plcp.py 400 /root/bigbuild \
  > logs/plcp_400.log 2>&1 || echo "queue: plcp FAILED"

echo "queue: bench.py warm        $(date)"
python bench.py > logs/bench_warm.json 2> logs/bench_warm.log \
  || echo "queue: bench FAILED"

echo "queue: LF ladder            $(date)"
python scripts/bench_lf2.py 16777216 256 \
  > logs/lf_ladder.log 2>&1 || echo "queue: lf FAILED"

echo "queue: done $(date)"
