"""Huffman-shaped wavelet trees (.hwt / .rlhwt files).

Host-side equivalents of libmaus2's ``wavelet::ImpCompactHuffmanWaveletTree``
(built by /root/reference/src/bwttohwt.cpp:35-40) and
``ImpCompactRLHuffmanWaveletTree`` (built by
/root/reference/src/hwtToRlHwt.cpp:89-198, which streams each BWT symbol's
code bits into one run-length bitvector generator per inner node and
concatenates the node blobs with a node index). The device-side rank oracle
is ``ops/rank.OccTable``; these classes are the *file formats* plus host
query support (access / rank / inverse-select), used by the converter and
verifier tools.

File formats (FORMATS.md):

    HWT1 / RHW1:
      magic      4B    b"HWT1" (plain) or b"RHW1" (run-length nodes)
      n          u64   sequence length
      nsyms      u32
      (sym u32, codelen u8, count u64) * nsyms   -- canonical Huffman spec
      node blobs in node-id order (RankBitVector / RLBitVector serialization)

The canonical tree is rebuilt from the code lengths on load, so shape and
node numbering are deterministic.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Type

import numpy as np

from ..util import serial
from .bitvector import RankBitVector, RLBitVector
from .huffman import HuffmanTree

_MAGIC_PLAIN = b"HWT1"
_MAGIC_RL = b"RHW1"


class _WaveletBase:
    """Shared implementation; subclasses pick the node bitvector class."""

    BV: Type = RankBitVector
    MAGIC = _MAGIC_PLAIN

    def __init__(self, tree: HuffmanTree, n: int, nodes):
        self.tree = tree
        self.n = n
        self.nodes = nodes  # list of bitvectors, index = trie node id
        counts = np.zeros(len(tree.symbols), dtype=np.int64)
        self.sym_list = np.array(tree.symbols, dtype=np.int64)
        for j, s in enumerate(tree.symbols):
            counts[j] = tree.hist.get(s, 0)
        # C array over the *present* symbols in sorted order
        self.counts = counts
        self.C = np.concatenate([[0], np.cumsum(counts)])

    # ---- construction ---------------------------------------------------
    @classmethod
    def build(cls, symbols: np.ndarray, hist: Optional[Dict[int, int]] = None):
        symbols = np.asarray(symbols, dtype=np.int64)
        if hist is None:
            uniq, cnt = np.unique(symbols, return_counts=True)
            hist = {int(s): int(c) for s, c in zip(uniq, cnt)}
        tree = HuffmanTree(hist)
        sigma = int(max(tree.symbols)) + 1
        codes, lengths = tree.code_arrays(sigma)
        sym_code = codes[symbols]
        sym_len = lengths[symbols]
        # node prefixes/depths from the trie
        prefixes, depths = _node_paths(tree)
        nodes = []
        for node_id in range(tree.num_inner):
            d = depths[node_id]
            pref = prefixes[node_id]
            in_node = (sym_len > d) & ((sym_code >> (sym_len - d)) == pref)
            bits = (sym_code[in_node] >> (sym_len[in_node] - d - 1)) & 1
            nodes.append(cls.BV(bits.astype(np.uint8)))
        return cls(tree, len(symbols), nodes)

    # ---- queries --------------------------------------------------------
    def access(self, i) -> np.ndarray:
        """Symbol(s) at position(s) i (batch)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        out = np.zeros(len(i), dtype=np.int64)
        node = np.zeros(len(i), dtype=np.int64)  # trie node id
        pos = i.copy()
        settled = np.zeros(len(i), dtype=bool)
        for _d in range(self.tree.max_length):
            for nid in np.unique(node[~settled]):
                sel = (~settled) & (node == nid)
                bv = self.nodes[nid]
                bits = bv.get(pos[sel])
                r1 = bv.rank1(pos[sel])
                newpos = np.where(bits == 1, r1, pos[sel] - r1)
                child0, child1 = self.tree.children[nid]
                for bit_val, child in ((0, child0), (1, child1)):
                    bsel = bits == bit_val
                    if not bsel.any() or child is None:
                        continue
                    idx = np.flatnonzero(sel)[bsel]
                    if child[0] == "leaf":
                        out[idx] = child[1]
                        settled[idx] = True
                    else:
                        node[idx] = child[1]
                        pos[idx] = newpos[bsel]
            if settled.all():
                break
        return out

    def rank(self, c: int, i) -> np.ndarray:
        """rank of symbol c at position(s) i (batch over i)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        if c not in self.tree.code:
            return np.zeros(len(i), dtype=np.int64)
        code, length = self.tree.code[c], self.tree.length[c]
        pos = i.copy()
        node = 0
        for d in range(length):
            bit = (code >> (length - 1 - d)) & 1
            bv = self.nodes[node]
            pos = bv.rank1(pos) if bit else bv.rank0(pos)
            child = self.tree.children[node][bit]
            if child is None:
                return np.zeros(len(i), dtype=np.int64)
            if child[0] == "leaf":
                break
            node = child[1]
        return pos

    def inverse_select(self, i) -> Tuple[np.ndarray, np.ndarray]:
        """(symbol, rank-of-symbol-at-i) pairs — the ``extendedLF`` primitive
        (/root/reference/src/checkbwt.cpp:202 uses sym + new rank)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        syms = np.zeros(len(i), dtype=np.int64)
        pos = i.copy()
        node = np.zeros(len(i), dtype=np.int64)
        settled = np.zeros(len(i), dtype=bool)
        for _d in range(self.tree.max_length):
            for nid in np.unique(node[~settled]):
                sel = (~settled) & (node == nid)
                bv = self.nodes[nid]
                bits = bv.get(pos[sel])
                r1 = bv.rank1(pos[sel])
                newpos = np.where(bits == 1, r1, pos[sel] - r1)
                child0, child1 = self.tree.children[nid]
                for bit_val, child in ((0, child0), (1, child1)):
                    bsel = bits == bit_val
                    if not bsel.any() or child is None:
                        continue
                    idx = np.flatnonzero(sel)[bsel]
                    if child[0] == "leaf":
                        syms[idx] = child[1]
                        pos[idx] = newpos[bsel]
                        settled[idx] = True
                    else:
                        node[idx] = child[1]
                        pos[idx] = newpos[bsel]
            if settled.all():
                break
        return syms, pos

    def decode_all(self) -> np.ndarray:
        return self.access(np.arange(self.n))

    # ---- serialization --------------------------------------------------
    def write(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.MAGIC)
            serial.write_u64(f, self.n)
            serial.write_u32(f, len(self.tree.symbols))
            for s in self.tree.symbols:
                serial.write_u32(f, int(s))
                serial.write_u8(f, self.tree.length[s])
                serial.write_u64(f, int(self.tree.hist.get(s, 0)))
            for bv in self.nodes:
                bv.write(f)

    @classmethod
    def read(cls, path: str):
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != cls.MAGIC:
                raise ValueError(
                    "bad wavelet magic %r in %s (expected %r)"
                    % (magic, path, cls.MAGIC)
                )
            n = serial.read_u64(f)
            nsyms = serial.read_u32(f)
            lengths = {}
            hist = {}
            for _ in range(nsyms):
                s = serial.read_u32(f)
                lengths[s] = serial.read_u8(f)
                hist[s] = serial.read_u64(f)
            tree = HuffmanTree.from_lengths(lengths)
            tree.hist = hist
            nodes = [cls.BV.read(f) for _ in range(tree.num_inner)]
        return cls(tree, n, nodes)


def _node_paths(tree: HuffmanTree):
    """(prefix, depth) per trie node id (root prefix=0 depth=0)."""
    prefixes = [0] * tree.num_inner
    depths = [0] * tree.num_inner
    stack = [(0, 0, 0)]
    while stack:
        nid, pref, d = stack.pop()
        prefixes[nid], depths[nid] = pref, d
        for bit in (0, 1):
            child = tree.children[nid][bit]
            if child is not None and child[0] == "node":
                stack.append((child[1], (pref << 1) | bit, d + 1))
    return np.array(prefixes), np.array(depths)


class HuffmanWaveletTree(_WaveletBase):
    """Plain-bitvector Huffman wavelet tree (.hwt)."""

    BV = RankBitVector
    MAGIC = _MAGIC_PLAIN


class RLHuffmanWaveletTree(_WaveletBase):
    """Run-length-node Huffman wavelet tree (.rlhwt)."""

    BV = RLBitVector
    MAGIC = _MAGIC_RL
