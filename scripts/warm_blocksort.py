"""Pre-compile the block-sort graph for the big-build block size.

The windowed doubling sort graph is keyed only by (W, sigma) — it takes
an unpacked int32 window — so warming it once serves every large build
(400M/2.2G/3.2G share the fixed 128M block size; the first 256M-shape
compile cost 52 min through the relay, so warming off the critical path
matters).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/warm_blocksort.py [block_mb] [sigma]
"""

import sys
import time

import numpy as np


def main():
    block_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sigma = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    max_block = block_mb * 1000 * 1000
    size = (max_block // 256) * 256          # _plan_blocks_fixed block size
    W = size + 1024                          # first-lookahead window

    import jax.numpy as jnp
    from bwtb3m_tpu.ops.windowsort import block_suffix_order_device

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(1, sigma, W).astype(np.int32))
    t0 = time.time()
    lo, hi, resolved = block_suffix_order_device(win, size, sigma)
    print("warm W=%d sigma=%d: %.1fs resolved=%s"
          % (W, sigma, time.time() - t0, resolved), flush=True)
    t0 = time.time()
    lo, hi, resolved = block_suffix_order_device(win, size, sigma)
    print("steady: %.1fs" % (time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
