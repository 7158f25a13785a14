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


def _initial_key_pair(sym: jnp.ndarray, sigma: int, w: int):
    """(key_hi, key_lo): packed words of symbols [i, i+w) and [i+w, i+2w).

    Fast path when w*bits == 32 (bits in {1,2,4,8}): pack aligned groups
    of w symbols once ([n/w, w] weighted sum), then produce every sliding
    window by combining two adjacent aligned words with a broadcast shift
    — 2 memory passes instead of w rolls. key_lo is a roll of key_hi.
    """
    n = sym.shape[0]
    bits = max(1, math.ceil(math.log2(max(2, sigma))))
    if w * bits == 32 and n % w == 0:
        u = sym.astype(jnp.uint32)
        mat = u.reshape(n // w, w)
        weights = (jnp.uint32(1) << (jnp.uint32(bits) * jnp.arange(
            w - 1, -1, -1, dtype=jnp.uint32)))[None, :]
        A = jnp.sum(mat * weights, axis=1, dtype=jnp.uint32)  # aligned words
        Anext = jnp.roll(A, -1)
        r = jnp.arange(w, dtype=jnp.uint32)[None, :] * jnp.uint32(bits)
        # window starting at i = w*k + j: high part from A[k], low from A[k+1]
        key_mat = jnp.where(
            r == 0, A[:, None],
            (A[:, None] << r) | (Anext[:, None] >> (jnp.uint32(32) - r)))
        key_hi = key_mat.reshape(n)
        key_lo = jnp.roll(key_hi, -w)
        return key_hi, key_lo
    return (_initial_key(sym, sigma, w),
            _initial_key(sym, sigma, w, offset=w))


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
    key_hi, key_lo = _initial_key_pair(sym, sigma, w)
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
    import os
    from ..util.devices import device_scope
    with device_scope(n):
        if os.environ.get("BWTB3M_SORT") == "ls":
            # tie-compacted variant: wins when the tied fraction collapses
            # quickly; measured slower than the single-graph path on both
            # random and repeat-rich 16M DNA on v5e (BENCH.md), so opt-in
            sa_dev, bwt_dev = suffix_array_ls(symbols, int(sigma))
        else:
            sym_dev = jnp.asarray(np.asarray(symbols, dtype=np.int32))
            sa_dev, bwt_dev = suffix_sa_bwt_jax(sym_dev, int(sigma))
        sa = np.asarray(jax.device_get(sa_dev), dtype=np.int64)
        bwt = np.asarray(jax.device_get(bwt_dev), dtype=np.int32)
    isa = np.zeros(n, dtype=np.int64)
    isa[sa] = np.arange(n, dtype=np.int64)
    return sa, isa, bwt


# --------------------------------------------------------------------------
# tie-compacted doubling (Larsson–Sadakane style) — the host-driven fast path
# --------------------------------------------------------------------------
#
# After the initial 2w-symbol sort most positions are already uniquely
# ranked (all of them, for random DNA); only *tied* positions need further
# rounds. Ranks switch to head-index semantics (rank = sorted index of the
# group's first element), so re-ranking a group is local: new rank = group
# head + offset of the (r1, r2)-subgroup. Each round sorts only the tied
# positions, padded to a power-of-two bucket so jit shapes stay cacheable.
# Real genomes (max LCP >> initial 32 symbols) gain ~5-10x over full-array
# rounds; random texts skip the loop entirely.

_INF32 = np.int32(2 ** 31 - 1)


def _heads_and_tied(flags: jnp.ndarray):
    """Group head indices + tied mask from change flags over sorted keys."""
    B = flags.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (B,), 0)
    heads = lax.cummax(jnp.where(flags, idx, 0))
    nxt = jnp.concatenate([flags[1:], jnp.ones(1, dtype=bool)])
    singleton = jnp.logical_and(flags, nxt)
    return heads, jnp.logical_not(singleton)


def _ls_round_core(rank, tied, k, B: int, n: int):
    """One compacted re-ranking pass over <= B tied positions."""
    sel = jnp.nonzero(tied, size=B, fill_value=n)[0].astype(jnp.int32)
    valid = sel < n
    selc = jnp.minimum(sel, n - 1)
    r1 = jnp.where(valid, jnp.take(rank, selc), _INF32)
    idx2 = (selc + k) % n
    r2 = jnp.where(valid, jnp.take(rank, idx2), _INF32)
    r1s, r2s, ps = lax.sort((r1, r2, sel), num_keys=3, is_stable=False)
    grp_flags = jnp.concatenate(
        [jnp.ones(1, dtype=bool), r1s[1:] != r1s[:-1]])
    sub_flags = jnp.logical_or(
        grp_flags,
        jnp.concatenate([jnp.ones(1, dtype=bool), r2s[1:] != r2s[:-1]]))
    idx = lax.broadcasted_iota(jnp.int32, (B,), 0)
    grp_start = lax.cummax(jnp.where(grp_flags, idx, 0))
    sub_start = lax.cummax(jnp.where(sub_flags, idx, 0))
    new_rank_s = r1s + (sub_start - grp_start)
    _heads, tied_s = _heads_and_tied(sub_flags)
    rank = rank.at[ps].set(new_rank_s, mode="drop")
    tied = tied.at[ps].set(jnp.logical_and(tied_s, ps < n), mode="drop")
    return rank, tied


@partial(jax.jit, static_argnums=(3, 4))
def _ls_rounds(rank: jnp.ndarray, tied: jnp.ndarray, k, B: int, n: int):
    """Run compacted rounds in a device-side while loop at fixed bucket B,
    exiting when done or when the tied set has shrunk enough that a
    smaller bucket is worthwhile (host re-buckets). Avoids per-round
    host syncs, which dominate on remote-attached devices."""

    def cond(carry):
        _rank, _tied, k, tc = carry
        small = jnp.logical_and(tc * 8 <= B, B > 2048)
        return jnp.logical_and(jnp.logical_and(tc > 0, k < n),
                               jnp.logical_not(small))

    def body(carry):
        rank, tied, k, _tc = carry
        rank, tied = _ls_round_core(rank, tied, k, B, n)
        return (rank, tied, jnp.minimum(k * 2, n), jnp.sum(tied).astype(jnp.int32))

    tc0 = jnp.sum(tied).astype(jnp.int32)
    rank, tied, k, tc = lax.while_loop(cond, body, (rank, tied, k, tc0))
    return rank, tied, k, tc


@partial(jax.jit, static_argnums=(1,))
def _ls_phase1(sym: jnp.ndarray, sigma: int):
    """Initial sort + optimistic finish: for texts resolved by the first
    2w symbols (random DNA) this single dispatch produces the SA/BWT."""
    rank, tied, _k = _ls_initial_core(sym, sigma)
    sa, bwt = _ls_finish_core(sym, rank)
    return sa, bwt, rank, tied, jnp.sum(tied).astype(jnp.int32)


def _ls_initial_core(sym: jnp.ndarray, sigma: int):
    n = sym.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    w = _pack_width(sigma)
    key_hi, key_lo = _initial_key_pair(sym, sigma, w)
    k1_s, k2_s, p_s = lax.sort((key_hi, key_lo, pos), num_keys=2, is_stable=True)
    flags = jnp.concatenate(
        [jnp.ones(1, dtype=bool),
         jnp.logical_or(k1_s[1:] != k1_s[:-1], k2_s[1:] != k2_s[:-1])])
    heads, tied_s = _heads_and_tied(flags)
    rank = jnp.zeros(n, jnp.int32).at[p_s].set(heads)
    tied = jnp.zeros(n, dtype=bool).at[p_s].set(tied_s)
    return rank, tied, min(2 * w, n)


def _ls_finish_core(sym: jnp.ndarray, rank: jnp.ndarray):
    n = sym.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    _r, sa = lax.sort((rank, pos), num_keys=1, is_stable=True)
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    return sa, jnp.take(sym, prev)


@partial(jax.jit, static_argnums=())
def _ls_finish(sym: jnp.ndarray, rank: jnp.ndarray):
    return _ls_finish_core(sym, rank)


def suffix_array_ls(symbols: np.ndarray, sigma: int):
    """Tie-compacted circular suffix sort. Returns (sa, bwt) device arrays.

    One device dispatch resolves random texts (initial sort + finish);
    repetitive texts run device-side while loops of compacted rounds at
    host-chosen power-of-two bucket sizes (one scalar sync per bucket
    stage, not per round — remote-device sync latency dominates
    otherwise).
    """
    sym = jnp.asarray(np.asarray(symbols, dtype=np.int32))
    n = int(sym.shape[0])
    w = _pack_width(int(sigma))
    sa, bwt, rank, tied, tc = _ls_phase1(sym, int(sigma))
    T = int(tc)
    k = min(2 * w, n)
    if T == 0 or k >= n:
        return sa, bwt
    while T > 0 and k < n:
        B = 1 << max(11, int(math.ceil(math.log2(max(2, T)))))
        B = min(B, 1 << int(math.ceil(math.log2(max(2, n)))))
        rank, tied, k_dev, tc = _ls_rounds(rank, tied, jnp.int32(k), B, n)
        T = int(tc)
        k = int(k_dev)
    return _ls_finish(sym, rank)


@partial(jax.jit, static_argnums=(1,))
def suffix_sa_bwt_jax(sym: jnp.ndarray, sigma: int):
    """(sa, bwt) with the rank scatter skipped when the initial 2w-symbol
    sort already resolves every rotation (the common case for real DNA):
    the 16M-element scatter costs more than the sort itself on TPU."""
    n = sym.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    w = _pack_width(sigma)
    key_hi, key_lo = _initial_key_pair(sym, sigma, w)
    k1_s, k2_s, p_s = lax.sort((key_hi, key_lo, pos), num_keys=2, is_stable=True)
    changed0 = jnp.logical_or(k1_s[1:] != k1_s[:-1], k2_s[1:] != k2_s[:-1])
    neq = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), changed0.astype(jnp.int32)])
    r_s = jnp.cumsum(neq, dtype=jnp.int32)
    done0 = r_s[-1] == jnp.int32(n - 1)
    w2 = min(2 * w, n)

    def resolved(_):
        return p_s

    def unresolved(_):
        rank = jnp.zeros(n, dtype=jnp.int32).at[p_s].set(r_s)

        def cond(carry):
            _rank, _sa, k, done = carry
            return jnp.logical_and(jnp.logical_not(done), k < n)

        def body(carry):
            rank, _sa, k, _done = carry
            idx2 = jnp.where(pos + k >= n, pos + k - n, pos + k)
            r2 = jnp.take(rank, idx2)
            r1_s, r2_s, ps = lax.sort((rank, r2, pos), num_keys=2,
                                      is_stable=True)
            chg = jnp.logical_or(r1_s[1:] != r1_s[:-1], r2_s[1:] != r2_s[:-1])
            nq = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), chg.astype(jnp.int32)])
            nr_s = jnp.cumsum(nq, dtype=jnp.int32)
            nrank = jnp.zeros(n, dtype=jnp.int32).at[ps].set(nr_s)
            return (nrank, ps, k * 2, nr_s[-1] == jnp.int32(n - 1))

        _rank, sa, _k, _done = lax.while_loop(
            cond, body, (rank, p_s, jnp.int32(w2), jnp.asarray(False)))
        return sa

    sa = lax.cond(done0, resolved, unresolved, None)
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    return sa, jnp.take(sym, prev)
