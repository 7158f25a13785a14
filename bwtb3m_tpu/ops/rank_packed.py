"""Bit-plane-packed occ tables — the bandwidth-optimal rank structure.

The plain ``OccTable`` gathers a 128-symbol int32 row (512 B) per rank
query; this variant packs each 128-symbol block into ceil(log2 sigma)
bit-planes of four u32 words each (32 B per query for DNA), answering the
in-block count with XOR/AND masks + ``lax.population_count``. This is the
TPU shape of the reference's cache-line-aligned occ superblocks
(``rank::DNARank``, /root/reference/src/bwttodnarank.cpp) and the path to
the north star's memory-bandwidth-limited gap kernel.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, tree_util

BLOCK = 128
_WPB = BLOCK // 32  # u32 words per block per plane


class PackedOccTable:
    """Pytree: planes u32 [nb, P, WPB], occ i32 [nb+1, sigma], C i32."""

    def __init__(self, planes, occ, C, n, sigma, nplanes):
        self.planes = planes
        self.occ = occ
        self.C = C
        self.n = n
        self.sigma = sigma
        self.nplanes = nplanes
        self.block = BLOCK

    def tree_flatten(self):
        return (self.planes, self.occ, self.C), (self.n, self.sigma, self.nplanes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


tree_util.register_pytree_node(
    PackedOccTable, PackedOccTable.tree_flatten, PackedOccTable.tree_unflatten
)


@partial(jax.jit, static_argnums=(1, 2))
def _build_packed_jax(bwt: jnp.ndarray, sigma: int, nplanes: int) -> PackedOccTable:
    n = bwt.shape[0]
    nb = (n + BLOCK - 1) // BLOCK
    pad = nb * BLOCK - n
    # pad with zeros: rank masks exclude padded positions (i <= n always)
    padded = jnp.concatenate([bwt.astype(jnp.uint32),
                              jnp.zeros((pad,), jnp.uint32)]) if pad else bwt.astype(jnp.uint32)
    blocks = padded.reshape(nb, BLOCK)
    # per-block symbol counts via one-hot (over the real symbols only)
    sym_ids = lax.broadcasted_iota(jnp.uint32, (1, 1, sigma), 2)
    real = (lax.broadcasted_iota(jnp.int32, (nb, BLOCK), 0) * BLOCK
            + lax.broadcasted_iota(jnp.int32, (nb, BLOCK), 1)) < n
    per_block = jnp.sum(
        jnp.logical_and(blocks[:, :, None] == sym_ids,
                        real[:, :, None]).astype(jnp.int32), axis=1)
    occ = jnp.concatenate(
        [jnp.zeros((1, sigma), jnp.int32), jnp.cumsum(per_block, axis=0)], axis=0)
    total = occ[-1]
    C = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(total)])
    # bit-planes: plane j word w of block b packs bit j of symbols
    # [w*32, (w+1)*32), LSB = first symbol
    lanes = blocks.reshape(nb, _WPB, 32)  # [nb, w, 32]
    weights = (jnp.uint32(1) << lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2))
    planes = []
    for j in range(nplanes):
        bits = (lanes >> jnp.uint32(j)) & jnp.uint32(1)
        planes.append(jnp.sum(bits * weights, axis=2, dtype=jnp.uint32))
    planes = jnp.stack(planes, axis=1)  # [nb, P, WPB]
    return PackedOccTable(planes, occ, C, n, sigma, nplanes)


def build_occ_packed(bwt, sigma: int) -> PackedOccTable:
    nplanes = max(1, math.ceil(math.log2(max(2, sigma))))
    return _build_packed_jax(jnp.asarray(bwt, jnp.int32), int(sigma), nplanes)


def _match_words(occt: PackedOccTable, words: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """words: u32 [B, P, W]; c: i32 [B] -> u32 [B, W] with 1-bits where
    the packed symbol equals c."""
    cu = c.astype(jnp.uint32)
    match = jnp.full(words.shape[::2], 0xFFFFFFFF, jnp.uint32)  # [B, W]
    for j in range(occt.nplanes):
        cbit = (cu >> jnp.uint32(j)) & jnp.uint32(1)
        flip = jnp.where(cbit == 1, jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
        match = match & (words[:, j, :] ^ flip[:, None])
    return match


def _prefix_mask(off: jnp.ndarray, W: int) -> jnp.ndarray:
    """u32 [B, W] masking bit positions < off within the block."""
    word_base = lax.broadcasted_iota(jnp.int32, (1, W), 1) * 32
    rel = jnp.clip(off[:, None] - word_base, 0, 32).astype(jnp.uint32)
    full = rel >= 32
    mask = jnp.where(
        full, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << rel) - jnp.uint32(1))
    return mask


def rank_batch_packed(occt: PackedOccTable, c: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    b = i // BLOCK
    bsafe = jnp.minimum(b, occt.planes.shape[0] - 1)
    words = occt.planes[bsafe]            # [B, P, W]
    base = occt.occ[b, c]
    match = _match_words(occt, words, c)  # [B, W]
    mask = _prefix_mask(i - b * BLOCK, _WPB)
    cnt = jnp.sum(lax.population_count(match & mask), axis=1).astype(jnp.int32)
    return base + cnt


def access_batch_packed(occt: PackedOccTable, i: jnp.ndarray) -> jnp.ndarray:
    b = i // BLOCK
    bsafe = jnp.minimum(b, occt.planes.shape[0] - 1)
    words = occt.planes[bsafe]            # [B, P, W]
    off = i - b * BLOCK
    w = off // 32
    bit = (off % 32).astype(jnp.uint32)
    sym = jnp.zeros(i.shape[0], jnp.int32)
    sel = jnp.take_along_axis(
        words, w[:, None, None].repeat(occt.nplanes, axis=1), axis=2
    )[:, :, 0]  # [B, P]
    for j in range(occt.nplanes):
        sym = sym | (((sel[:, j] >> bit) & jnp.uint32(1)).astype(jnp.int32) << j)
    return sym


def lf_step_batch_packed(occt: PackedOccTable, r: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sym = access_batch_packed(occt, r)
    return sym, occt.C[sym] + rank_batch_packed(occt, sym, r)
