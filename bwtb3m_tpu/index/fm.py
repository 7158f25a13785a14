"""FM index: backward search, LF walks, locate, extract.

Combines a rank structure (Huffman wavelet tree, RL wavelet tree, or
DNARank), the C array, and sampled SA/ISA — the roles of libmaus2's
``lf::*LF`` classes and ``fm::SampledSA/SampledISA`` as used by
/root/reference/src/probeScanDna.cpp:100-107 (``LF.step``) and
/root/reference/src/bwtdecodeblock.cpp (range decode via sorted ISA + LF).

Host-side (numpy) implementation; the batched device path for heavy walks
is ``ops/lf.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .dnarank import DNARank
from .sampled import SampledISA, SampledSA
from .wavelet import HuffmanWaveletTree, RLHuffmanWaveletTree


class FMIndex:
    def __init__(self, ranker, sigma: int, n: int,
                 sampled_sa: Optional[SampledSA] = None,
                 sampled_isa: Optional[SampledISA] = None):
        self.ranker = ranker
        self.sigma = sigma
        self.n = n
        self.sa = sampled_sa
        self.isa = sampled_isa
        # C over the full symbol domain
        counts = np.zeros(sigma, dtype=np.int64)
        if isinstance(ranker, DNARank):
            total = ranker.occ[-1]
            counts[: len(total)] = total
        else:
            for s, c in zip(ranker.sym_list, ranker.counts):
                counts[s] = c
        self.C = np.concatenate([[0], np.cumsum(counts)])

    # ---- construction ---------------------------------------------------
    @classmethod
    def from_bwt_result(cls, result, structure: str = "hwt") -> "FMIndex":
        """Build from a BwtResult's files. structure: hwt | rlhwt | dnarank."""
        bwt = result.load_bwt()
        sigma = result.sigma
        if structure == "dnarank":
            ranker = DNARank(bwt.astype(np.uint8))
        elif structure == "rlhwt":
            ranker = RLHuffmanWaveletTree.build(bwt)
        else:
            ranker = HuffmanWaveletTree.build(bwt)
        ssa = SampledSA.load(result.sa_path, result.n) if result.sa_path else None
        sisa = SampledISA.load(result.isa_path, result.n) if result.isa_path else None
        return cls(ranker, sigma, result.n, ssa, sisa)

    # ---- primitives -----------------------------------------------------
    def rank(self, c: int, i):
        return self.ranker.rank(c, i)

    def step(self, c: int, lo, hi) -> Tuple[np.ndarray, np.ndarray]:
        """Backward-search step (reference ``LF.step(sym, lo, hi)``)."""
        return (self.C[c] + self.ranker.rank(c, lo),
                self.C[c] + self.ranker.rank(c, hi))

    def extended_lf(self, r):
        """(sym, LF(r)) — one backwards step of the decode walk (batched)."""
        r = np.atleast_1d(np.asarray(r, dtype=np.int64))
        if isinstance(self.ranker, DNARank):
            sym = self.ranker.symbol(r)
            rk = np.zeros(len(r), dtype=np.int64)
            for c in range(4):
                mask = sym == c
                if mask.any():
                    rk[mask] = self.ranker.rank(c, r[mask])
        else:
            sym, rk = self.ranker.inverse_select(r)
        return sym, self.C[sym] + rk

    # ---- queries --------------------------------------------------------
    def backward_search(self, pattern) -> Tuple[int, int]:
        """Interval of rotations prefixed by `pattern` (processed
        right-to-left). Returns half-open (lo, hi)."""
        lo, hi = 0, self.n
        for c in reversed(np.asarray(pattern, dtype=np.int64)):
            lo, hi = self.step(int(c), lo, hi)
            lo = int(np.asarray(lo).reshape(-1)[0])
            hi = int(np.asarray(hi).reshape(-1)[0])
            if hi <= lo:
                return lo, lo
        return lo, hi

    def count(self, pattern) -> int:
        lo, hi = self.backward_search(pattern)
        return hi - lo

    def locate(self, r: int) -> int:
        """Text position of rank r via LF walk to the nearest SA sample."""
        if self.sa is None:
            raise ValueError("no sampled SA attached")
        steps = 0
        r = int(r)
        while r % self.sa.rate != 0:
            _sym, r2 = self.extended_lf(r)
            r = int(r2[0])
            steps += 1
        return int((self.sa.values[r // self.sa.rate] + steps) % self.n)

    def locate_batch(self, ranks) -> np.ndarray:
        """Text positions for a batch of ranks — all walks step together
        (the ILP lesson of bwttestdecodespeed, host-side)."""
        if self.sa is None:
            raise ValueError("no sampled SA attached")
        r = np.asarray(ranks, dtype=np.int64).copy()
        steps = np.zeros(len(r), dtype=np.int64)
        rate = self.sa.rate
        active = (r % rate) != 0
        while active.any():
            _sym, r2 = self.extended_lf(r[active])
            r[active] = r2
            steps[active] += 1
            active = (r % rate) != 0
        return (self.sa.values[r // rate] + steps) % self.n

    def locate_range(self, lo: int, hi: int) -> np.ndarray:
        return np.sort(self.locate_batch(np.arange(lo, hi)))

    def extract(self, start: int, length: int) -> np.ndarray:
        """Decode text[start : start+length] (circular) from the index —
        the bwtdecodeblock role: seek the nearest ISA sample at or after
        the end, LF-walk back emitting symbols."""
        if self.isa is None:
            raise ValueError("no sampled ISA attached")
        end = start + length  # exclusive, circular
        rate = self.isa.rate
        # nearest sampled position at or after end (circular wrap allowed)
        anchor = ((end + rate - 1) // rate) * rate
        walk = anchor - end  # extra steps before symbols we want
        if anchor >= self.n:
            anchor_idx = 0
            walk = (self.n - end) % self.n  # walk from position 0 sample
            anchor = 0
        else:
            anchor_idx = anchor // rate
        r = int(self.isa.values[anchor_idx])
        # LF emits text[p-1] when at rank of suffix p
        out = np.zeros(length, dtype=np.int64)
        total = walk + length
        for j in range(total):
            sym, r2 = self.extended_lf(r)
            if j >= walk:
                out[length - 1 - (j - walk)] = sym[0]
            r = int(r2[0])
        return out
