#!/bin/bash
# Round-3 TPU queue, phase 2: walk-kernel A/B + 256M bytestream build.
# Usage: nohup bash scripts/queue_r3b.sh <pid-of-phase-1> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue2: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "queue2: walk variant ladder  $(date)"
python scripts/bench_walk.py 16777216 131072 2048 \
  > logs/walk_ladder.log 2>&1 || echo "queue2: walk FAILED"
python scripts/bench_walk.py 16777216 16384 2048 \
  >> logs/walk_ladder.log 2>&1 || true

echo "queue2: 256M bytestream scaled build  $(date)"
python - > logs/byte256.log 2>&1 <<'EOF'
import json, os, time
import numpy as np
from bwtb3m_tpu.engine import BwtOptions, check_bwt, compute_bwt
work = "/root/bigbuild"
inp = os.path.join(work, "b256m.bin")
n = 256 * 1000 * 1000
if not os.path.exists(inp):
    rng = np.random.default_rng(7)
    rng.integers(0, 256, n, dtype=np.uint8).tofile(inp)
t0 = time.time()
res = compute_bwt(BwtOptions(
    input_path=inp, input_type="bytestream",
    output_filename=os.path.join(work, "b256m.bwt"),
    engine="merge", bwt_only=True, max_block_symbols=128 * 1000 * 1000,
    verbose=1))
build_s = time.time() - t0
text = np.fromfile(inp, np.uint8).astype(np.int32)
t0 = time.time()
ok = check_bwt(res, text)
print(json.dumps({"n": n, "sigma": 256, "build_s": round(build_s, 1),
                  "checkbwt_s": round(time.time() - t0, 1),
                  "checkbwt_ok": bool(ok)}))
EOF

echo "queue2: done $(date)"
