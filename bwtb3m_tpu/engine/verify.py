"""Full-text BWT verification — equivalent of the ``checkbwt`` driver.

The reference verifier (/root/reference/src/checkbwt.cpp:27-241) walks the
entire text backwards via ``extendedLF`` on the rank structure, comparing
every emitted symbol against a circular-reverse read of the original text,
parallelized by splitting the rank space at ``.preisa`` samples. This is the
correctness oracle of the whole suite (SURVEY.md section 4.2).

TPU redesign: the per-thread walks become *lanes* of one batched LF kernel —
all segments step simultaneously; each step is a batched rank query. A lane
whose segment is exhausted keeps stepping but its comparisons are masked.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.lf import lf_step_batch
from ..ops.rank import OccTable
from ..util.log import VerboseLog
from .result import BwtResult


def check_bwt(result: BwtResult, text: np.ndarray,
              num_lanes: int = 256, log: Optional[VerboseLog] = None) -> bool:
    """Verify that `result`'s .bwt + .preisa reproduce `text` exactly.

    Splits the walk at preisa samples into up to `num_lanes` lanes plus the
    preisa seeds themselves; returns True iff every one of the n emitted
    symbols equals the circular-reverse text read (reference prints gok=1,
    /root/reference/src/checkbwt.cpp)."""
    log = log or VerboseLog(0)
    n = len(text)
    from ..util.devices import device_scope
    with device_scope(n):
        return _check_bwt_impl(result, text, log, n)


def _check_bwt_impl(result: BwtResult, text: np.ndarray,
                    log: VerboseLog, n: int) -> bool:
    occt, symmap = result.load_occ(dense=True)
    if symmap is not None:
        # occ is over densified symbols; densify the text the same way
        remap = np.full(int(max(text.max(), symmap.max())) + 1, -1, np.int32)
        remap[symmap] = np.arange(len(symmap), dtype=np.int32)
        text = remap[np.asarray(text, dtype=np.int64)]
        if (text < 0).any():
            return False
    ranks, positions, _rate = result.load_preisa()

    # sort seeds by position; each seed walks back to the previous seed
    order = np.argsort(positions)
    positions = positions[order]
    ranks = ranks[order]
    if len(positions) == 0 or positions[0] != 0:
        raise ValueError("preisa must contain a sample at position 0")
    # segment for seed i: walk from (r_i, p_i) backwards to previous sample
    # (circularly, the first seed wraps to the last)
    seg_len = np.empty(len(positions), dtype=np.int64)
    seg_len[0] = (positions[0] - positions[-1]) % n
    if len(positions) > 1:
        seg_len[1:] = positions[1:] - positions[:-1]
    if len(positions) == 1:
        seg_len[0] = n
    assert seg_len.sum() == n, (seg_len.sum(), n)

    # persist the walk-segment records — the role of the reference's
    # .preisa.checkinfo thread-split file (checkbwt.cpp:60-115): triples
    # (segment length, start position, start rank) per lane
    try:
        info = np.empty((len(positions), 3), dtype="<u8")
        info[:, 0] = seg_len
        info[:, 1] = positions
        info[:, 2] = ranks
        with open(result.preisa_path + ".checkinfo", "wb") as f:
            f.write(info.tobytes())
    except OSError:
        pass  # read-only locations: the check itself proceeds

    steps = int(seg_len.max())
    # ship the text bit-packed when the (densified) alphabet is small
    import math as _math
    sigma_t = int(np.asarray(text).max()) + 1 if n else 1
    bits = max(1, _math.ceil(_math.log2(max(2, sigma_t))))
    if bits <= 8:
        from ..io.compact import pack_bits
        from ..ops.pack import unpack_bits_device
        text_dev = unpack_bits_device(
            jnp.asarray(pack_bits(np.asarray(text, np.int64), bits)), bits, n)
    else:
        text_dev = jnp.asarray(np.asarray(text, dtype=np.int32))
    r0 = jnp.asarray(ranks.astype(np.int32))
    p0 = jnp.asarray(positions.astype(np.int32))
    lens = jnp.asarray(seg_len.astype(np.int32))

    bad = _walk_verify_run(occt, text_dev, r0, p0, lens, steps)
    total_bad = int(np.asarray(bad).sum())
    log.v("checkbwt: %d mismatches over n=%d" % (total_bad, n))
    return total_bad == 0


@partial(jax.jit, static_argnums=(5,))
def _walk_verify_run(occt: OccTable, text: jnp.ndarray, r0: jnp.ndarray,
                     p0: jnp.ndarray, lens: jnp.ndarray, steps: int):
    n = text.shape[0]

    def body(j, carry):
        r, p, bad = carry
        sym, r2 = lf_step_batch(occt, r)
        pprev = jnp.where(p == 0, n - 1, p - 1)
        # single-element text read per lane: an element gather moves 4B
        # per lane vs 512B for a blocked row gather — at 100M/98k lanes
        # the row variant regressed checkbwt 13.3s -> 53.4s (BENCH.md)
        expect = jnp.take(text, pprev)
        active = j < lens
        bad = bad + jnp.logical_and(sym != expect, active).astype(jnp.int32)
        return (r2, pprev, bad)

    bad0 = jnp.zeros(r0.shape[0], jnp.int32)
    _r, _p, bad = lax.fori_loop(0, steps, body, (r0, p0, bad0))
    return bad
