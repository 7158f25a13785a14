"""Circular suffix sorting on device via prefix doubling.

This is the TPU-native replacement for the reference engine's per-block
``divsufsort`` + balanced gap-array merging (``BwtMergeSort::computeBwt``,
/root/reference/src/bwtb3m.cpp:62-63; algorithm arXiv:1604.06687). Rather
than translating that external-memory CPU design, the rebuild sorts *rotations
of the circular text* directly — bwtb3m's BWT is defined on the circular text
with no terminator (reference README "Output") — using Manber–Myers prefix
doubling where every step is one large stable multi-key sort, the operation
XLA maps best onto TPU:

    rank_0[i]   = dense rank of the first w symbols at i (w symbols packed
                  into one uint32 word, so the first sort already resolves
                  w characters)
    rank_{k->2k}: stable sort of (rank[i], rank[(i+k) mod n], i) triples,
                  then a cumsum over "key changed" flags re-densifies ranks.

The loop runs under ``lax.while_loop`` with an all-ranks-distinct early exit;
for an aperiodic random text over sigma symbols it terminates after
~log_sigma(n) - log_sigma(w) rounds. Periodic texts never fully densify:
equal rotations stay tied and are ordered by position (stable sort), which
yields a deterministic SA and the correct BWT (equal rotations share their
preceding symbol).

All state is int32; texts up to 2**31-1 symbols are supported on a single
chip. The multi-chip sharded variant lives in ``parallel/``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _pack_width(sigma: int) -> int:
    """How many symbols fit in a uint32 initial key."""
    bits = max(1, math.ceil(math.log2(max(2, sigma))))
    return max(1, 32 // bits)


def _initial_key(sym: jnp.ndarray, sigma: int, w: int, offset: int = 0) -> jnp.ndarray:
    """uint32 key of w circularly-consecutive symbols starting at i+offset."""
    n = sym.shape[0]
    bits = max(1, math.ceil(math.log2(max(2, sigma))))
    key = jnp.zeros(n, dtype=jnp.uint32)
    u = sym.astype(jnp.uint32)
    for j in range(w):
        rolled = jnp.roll(u, -(offset + j))  # sym[(i+offset+j) mod n]
        key = (key << bits) | rolled
    return key


@partial(jax.jit, static_argnums=(1,))
def suffix_array_jax(sym: jnp.ndarray, sigma: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute the circular SA of ``sym`` on device.

    Returns (sa, rank): ``sa[r]`` = start position of the r-th smallest
    rotation (ties by position), ``rank[i]`` = dense rank of rotation i
    (ties share a rank).
    """
    n = sym.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    w = _pack_width(sigma)

    # two packed words resolve 2w symbols in the very first sort — for a
    # random DNA text (w=16) ranks are typically all distinct immediately
    # and the doubling loop never runs
    key_hi = _initial_key(sym, sigma, w)
    key_lo = _initial_key(sym, sigma, w, offset=w)
    k1_s, k2_s, p_s = lax.sort((key_hi, key_lo, pos), num_keys=2, is_stable=True)
    changed0 = jnp.logical_or(k1_s[1:] != k1_s[:-1], k2_s[1:] != k2_s[:-1])
    neq = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), changed0.astype(jnp.int32)]
    )
    r_s = jnp.cumsum(neq, dtype=jnp.int32)
    rank = jnp.zeros(n, dtype=jnp.int32).at[p_s].set(r_s)
    done0 = r_s[-1] == jnp.int32(n - 1)
    w = min(2 * w, n)

    def cond(carry):
        _rank, _sa, k, done = carry
        return jnp.logical_and(jnp.logical_not(done), k < n)

    def body(carry):
        rank, _sa, k, _done = carry
        idx2 = jnp.where(pos + k >= n, pos + k - n, pos + k)  # (i+k) mod n
        r2 = jnp.take(rank, idx2)
        r1_s, r2_s, p_s = lax.sort((rank, r2, pos), num_keys=2, is_stable=True)
        changed = jnp.logical_or(r1_s[1:] != r1_s[:-1], r2_s[1:] != r2_s[:-1])
        neq = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), changed.astype(jnp.int32)]
        )
        new_r_s = jnp.cumsum(neq, dtype=jnp.int32)
        new_rank = jnp.zeros(n, dtype=jnp.int32).at[p_s].set(new_r_s)
        done = new_r_s[-1] == jnp.int32(n - 1)
        return (new_rank, p_s, k * 2, done)

    rank, sa, _k, _done = lax.while_loop(
        cond, body, (rank, p_s, jnp.int32(w), done0)
    )
    return sa, rank


@partial(jax.jit, static_argnums=())
def bwt_from_sa(sym: jnp.ndarray, sa: jnp.ndarray) -> jnp.ndarray:
    """BWT of the circular text: bwt[r] = sym[(sa[r] - 1) mod n]."""
    n = sym.shape[0]
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    return jnp.take(sym, prev)


def suffix_array(symbols: np.ndarray, sigma: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host wrapper: returns (sa, isa, bwt) as int64/int32 numpy arrays.

    ``isa`` here is the positional rank *with ties broken by position*
    (i.e. the exact inverse permutation of ``sa``), which is what sampled
    ISA files store.
    """
    n = len(symbols)
    if n >= 2 ** 31:
        raise ValueError(
            "single-chip doubling supports n < 2^31 (int32 rank space); "
            "use the sharded engine across a mesh for larger texts")
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.int32)
    if n == 1:
        return (np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64),
                np.asarray(symbols, dtype=np.int32))
    from ..util.devices import device_scope
    with device_scope(n):
        sym_dev = jnp.asarray(np.asarray(symbols, dtype=np.int32))
        sa_dev, _rank = suffix_array_jax(sym_dev, int(sigma))
        bwt_dev = bwt_from_sa(sym_dev, sa_dev)
        sa = np.asarray(jax.device_get(sa_dev), dtype=np.int64)
        bwt = np.asarray(jax.device_get(bwt_dev), dtype=np.int32)
    isa = np.zeros(n, dtype=np.int64)
    isa[sa] = np.arange(n, dtype=np.int64)
    return sa, isa, bwt
