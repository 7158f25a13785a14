#!/bin/bash
# Round-3 TPU queue, phase 6: gather-locality probe after the 3200 rerun.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue6: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "queue6: gather probe  $(date)"
python scripts/bench_gather.py 1048576 131072 > logs/gather_probe.log 2>&1 \
  || echo "queue6: gather 1M FAILED"
python scripts/bench_gather.py 4194304 131072 >> logs/gather_probe.log 2>&1 \
  || echo "queue6: gather 4M FAILED"
python scripts/bench_gather.py 65536 131072 >> logs/gather_probe.log 2>&1 \
  || echo "queue6: gather 64k FAILED"
echo "queue6: done $(date)"
