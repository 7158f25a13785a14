"""Blockwise BWT construction with gap-array merging — the memory-bounded
engine (equivalent of the reference's balanced block merge,
``BwtMergeSort`` phases 2-3, SURVEY.md section 3.1).

The text lives in host RAM (the analog of the reference's disk); device
HBM holds only one block's sort window or the merged BWT's occ table at a
time. Blocks are sorted right-to-left on device (ops/windowsort.py), then
folded into the merged right part M one at a time:

    for each left block [s, m):
        occ(BWT_M) -> device
        gap chain (ops/gap.py): R(p) for p = m-1 .. s, anchored + batched
        host interleave of (SA_b, BWT_b) into (SA_M, BWT_M) guided by R

The reference uses a balanced binary merge tree; this rebuild folds
left-to-right blocks into M sequentially (same asymptotic work for equal
block sizes: every symbol participates in at most ceil(n/blocksize) gap
chains, and each fold's chain is fully batched on device). A tree variant
batching independent pair-merges is the planned multi-pod extension.

Outputs are bit-identical to the single-block doubling engine (tested on
the virtual mesh suite): same rotation order, same position tie-breaks.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

from ..ops.gap import GapChainRunner, compute_gt0
from ..ops.rank import build_occ
from ..ops.windowsort import block_suffix_order
from ..util.log import VerboseLog
from .options import BwtOptions


def _plan_blocks(n: int, max_block: int):
    """Contiguous blocks of ~equal size, each <= max_block."""
    nb = max(1, math.ceil(n / max_block))
    bounds = np.linspace(0, n, nb + 1).astype(np.int64)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(nb)]


def _sort_block(text: np.ndarray, s: int, e: int, sigma: int,
                lookahead: int, log: VerboseLog) -> np.ndarray:
    """Rotation order of positions [s, e), via windowed doubling with
    automatic lookahead extension."""
    n = len(text)
    block_len = e - s
    la = min(lookahead, n)
    while True:
        W = min(block_len + la, block_len + n)
        idx = (s + np.arange(W)) % n
        lo_order, hi_order, resolved = block_suffix_order(text[idx], block_len, sigma)
        if resolved:
            return (lo_order + s).astype(np.int64)
        if la >= n:
            # every block suffix saw the full rotation: remaining ties are
            # equal rotations, ordered by position = the pad_high order
            return (hi_order + s).astype(np.int64)
        la = min(la * 4, n)
        log.v("block [%d,%d): lookahead extended to %d" % (s, e, la))


def blockwise_bwt(symbols: np.ndarray, sigma: int, options: BwtOptions,
                  log: Optional[VerboseLog] = None,
                  num_segments: int = 4096,
                  anchor_lookback: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (sa, isa, bwt) identical to ops.doubling.suffix_array."""
    log = log or VerboseLog(1)
    text = np.asarray(symbols, dtype=np.int32)
    n = len(text)
    from ..util.devices import device_scope
    with device_scope(n):
        return _blockwise_bwt_impl(text, sigma, options, log,
                                   num_segments, anchor_lookback)


def _blockwise_bwt_impl(text, sigma, options, log, num_segments,
                        anchor_lookback):
    n = len(text)
    blocks = _plan_blocks(n, options.max_block_symbols)
    lookahead = max(1024, options.large_lcp_thres)
    if anchor_lookback is None:
        anchor_lookback = max(256, options.large_lcp_thres)
    log.v("blockwise engine: %d blocks, lookahead=%d" % (len(blocks), lookahead))

    gt0 = compute_gt0(text)

    # rightmost block initializes M
    s, e = blocks[-1]
    sa_m = _sort_block(text, s, e, sigma, lookahead, log)
    bwt_m = text[(sa_m - 1) % n]
    m = s
    isa_m_of_m = int(np.flatnonzero(sa_m == m)[0])

    stop_file = options.output_filename + ".stop"
    for bi in range(len(blocks) - 2, -1, -1):
        if os.path.exists(stop_file):
            # manual kill switch between folds — the analog of the
            # reference's "loopscomplete" escape hatch (lcpbit.cpp:965)
            raise RuntimeError(
                "stop requested via %s after %d/%d merges"
                % (stop_file, len(blocks) - 2 - bi, len(blocks) - 1))
        s, e = blocks[bi]
        assert e == m
        sa_b = _sort_block(text, s, e, sigma, lookahead, log)
        bwt_b = text[(sa_b - 1) % n]

        occt = build_occ(bwt_m, sigma)
        runner = GapChainRunner(occt, text, gt0, m, isa_m_of_m)

        # segments: descending position ranges [a_j, b_j), b_0 = m
        block_len = e - s
        T = max(1, min(num_segments, block_len // 64 or 1))
        seg_bounds = np.linspace(s, m, T + 1).astype(np.int64)  # ascending
        # chain j covers positions [seg_bounds[j], seg_bounds[j+1])
        starts = seg_bounds[1:] - 1          # first position each chain visits
        lens = (seg_bounds[1:] - seg_bounds[:-1])
        # seeds: R(starts_j + 1). Rightmost chain: exact R(m) = ISA_M(m).
        seeds = np.zeros(T, dtype=np.int64)
        seeds[T - 1] = isa_m_of_m
        if T > 1:
            lb = anchor_lookback
            while True:
                anchor_starts = starts[: T - 1]
                vals, ok = runner.anchor(anchor_starts, min(lb, n))
                if ok.all():
                    seeds[: T - 1] = vals
                    break
                if lb >= n:
                    # serial fallback: single chain
                    log.w("anchors unresolved at full lookback; running one chain")
                    T = 1
                    starts = np.array([m - 1], dtype=np.int64)
                    lens = np.array([block_len], dtype=np.int64)
                    seeds = np.array([isa_m_of_m], dtype=np.int64)
                    break
                lb = min(lb * 4, n)
                log.v("anchor lookback extended to %d" % lb)

        gap, _final = runner.run_chains(starts, seeds, lens)
        assert gap.sum() == block_len, (gap.sum(), block_len)

        # ---- host interleave guided by the gap histogram ----------------
        # R values sorted by block rotation order == R restricted to SA_b
        # in order; reconstruct per-entry R from the histogram plus the
        # within-gap ordering = block order.
        # counts: gap[r] block suffixes fall before M rank r.
        Mlen = len(sa_m)
        cnt_le = np.cumsum(gap)              # cnt_le[r] = #R <= r
        merged_len = Mlen + block_len
        sa_new = np.empty(merged_len, dtype=np.int64)
        bwt_new = np.empty(merged_len, dtype=bwt_m.dtype)
        m_dest = np.arange(Mlen) + cnt_le[:Mlen]
        sa_new[m_dest] = sa_m
        bwt_new[m_dest] = bwt_m
        r_per_entry = np.repeat(np.arange(Mlen + 1), gap)
        b_dest = r_per_entry + np.arange(block_len)
        sa_new[b_dest] = sa_b
        bwt_new[b_dest] = bwt_b

        sa_m, bwt_m = sa_new, bwt_new
        m = s
        isa_m_of_m = int(np.flatnonzero(sa_m == m)[0])
        log.v("merged block [%d,%d): |M|=%d" % (s, e, len(sa_m)))

    isa = np.zeros(n, dtype=np.int64)
    isa[sa_m] = np.arange(n, dtype=np.int64)
    return sa_m, isa, bwt_m.astype(np.int32)
