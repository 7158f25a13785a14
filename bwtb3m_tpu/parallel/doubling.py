"""Sharded circular suffix sorting over a device mesh.

Multi-chip version of ``ops/doubling.py``: the text, rank vector and sort
waves are sharded over a 1-D mesh axis; every doubling round is one
distributed multi-key sort (``parallel/blocksort.py``) plus a dense-rank
renumbering whose only cross-shard traffic is a boundary ppermute and an
all_gather of D scalars. This replaces the reference engine's
blocks-sharded-over-threads + balanced merge tree (SURVEY.md sections 2.3,
3.1) with collective sort waves — the natural XLA/SPMD formulation.

Shard layout invariants (D shards, K = n / D):
* by-position arrays: shard s owns positions [s*K, (s+1)*K)
* by-rank arrays (sa, sorted keys): shard s owns sorted indices
  [s*K, (s+1)*K)

The text length must be divisible by the mesh size (callers pick block
geometry; the circular text cannot be padded).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.doubling import _pack_width
from .blocksort import (distributed_sort, exclusive_shard_offset,
                        fetch_prev_shard_last)
from .mesh import AXIS, shard_1d


def _shift_perm(D: int, m: int):
    """ppermute perm so that shard s receives shard (s+m) mod D's data."""
    return [(i, (i - m) % D) for i in range(D)]


def _roll_rank(rank_local: jnp.ndarray, k, D: int, K: int, axis: str) -> jnp.ndarray:
    """rank[(i+k) mod n] for this shard's positions; k is traced.

    The shard shift q = k // K is applied by composing static
    shift-by-2^j ppermutes selected by q's bits (q is replicated across
    shards, so every device takes the same branch); the intra-shard
    remainder is one dynamic slice over a 2-shard window.
    """
    q = k // K
    rem = k % K
    A = rank_local
    j = 0
    while (1 << j) < max(D, 2):
        bit = (q >> j) & 1
        perm = _shift_perm(D, 1 << j)
        A = lax.cond(
            bit == 1,
            lambda a: lax.ppermute(a, axis, perm),
            lambda a: a,
            A,
        )
        j += 1
    B = lax.ppermute(A, axis, _shift_perm(D, 1))
    ext = jnp.concatenate([A, B])
    return lax.dynamic_slice(ext, (rem,), (K,))


def _dense_ranks_from_sorted(keys, s, D: int, axis: str) -> jnp.ndarray:
    """Global 0-based dense ranks for globally sorted key columns."""
    flags_mid = keys[0][1:] != keys[0][:-1]
    for kcol in keys[1:]:
        flags_mid = jnp.logical_or(flags_mid, kcol[1:] != kcol[:-1])
    prev = [fetch_prev_shard_last(kcol, D, axis) for kcol in keys]
    first_neq = keys[0][0] != prev[0]
    for kcol, pv in zip(keys[1:], prev[1:]):
        first_neq = jnp.logical_or(first_neq, kcol[0] != pv)
    first_flag = jnp.where(s == 0, False, first_neq)
    flags = jnp.concatenate(
        [first_flag[None].astype(jnp.int32), flags_mid.astype(jnp.int32)]
    )
    incl = jnp.cumsum(flags, dtype=jnp.int32)
    base = exclusive_shard_offset(incl[-1], D, axis)
    return base + incl


def _build_kernel(D: int, K: int, n: int, sigma: int, axis: str):
    """n real positions laid out in slots [0, n) of N = D*K; slots [n, N)
    are pads holding a copy of text[0 : N-n] so packed keys near the wrap
    read the correct circular successors (the pad count is kept >= the
    pack width by the caller). Pads carry rank == their slot id (> any
    real rank) at all times, so they sort after every real entry and stay
    out of the dense-rank renumbering of the real rotations."""
    N = D * K
    pad = N - n
    bits = max(1, math.ceil(math.log2(max(2, sigma))))
    # the halo only extends one shard to the right: cap the packed width
    w = min(_pack_width(sigma), K)
    assert pad == 0 or pad >= w

    def real_max_dense(nr_s):
        """Dense rank of the last REAL entry (global sorted index n-1)."""
        cand = nr_s[(n - 1) % K]
        return lax.all_gather(cand, axis)[(n - 1) // K]

    def kernel(sym_local: jnp.ndarray):
        s = lax.axis_index(axis)
        pos = s * K + lax.broadcasted_iota(jnp.int32, (K,), 0)  # slot ids
        is_pad = pos >= n

        # ---- initial key: w symbols packed, halo from the next shard ----
        halo = lax.ppermute(sym_local[:w], axis, _shift_perm(D, 1))
        ext = jnp.concatenate([sym_local, halo]).astype(jnp.uint32)
        key0 = jnp.zeros(K, jnp.uint32)
        for j in range(w):
            key0 = (key0 << bits) | lax.dynamic_slice(ext, (j,), (K,))
        # pads must sort strictly after every real entry: max key plus a
        # flag column (a real packed key can itself be 0xFFFFFFFF)
        key0 = jnp.where(is_pad, jnp.uint32(0xFFFFFFFF), key0)
        padflag = is_pad.astype(jnp.uint32)

        k_s, f_s, p_s = distributed_sort(
            (key0, padflag, pos), num_keys=3, D=D, axis=axis)
        r_s = _dense_ranks_from_sorted((k_s, f_s), s, D, axis)
        _pp, rank_by_pos = distributed_sort((p_s, r_s), num_keys=1, D=D, axis=axis)
        rank_by_pos = jnp.where(is_pad, pos, rank_by_pos)
        done0 = real_max_dense(r_s) == jnp.int32(n - 1)

        def roll2(rank, k):
            """rank at real position (slot + k) mod n for real slots."""
            if pad == 0:
                return _roll_rank(rank, k, D, K, axis)
            a = _roll_rank(rank, k % N, D, K, axis)
            b = _roll_rank(rank, (k + pad) % N, D, K, axis)
            # pos + k < n, written overflow-safe (pos + k can pass 2^31)
            return jnp.where(pos < n - k, a, b)

        def cond(carry):
            _rank, _sa, k, done = carry
            return jnp.logical_and(jnp.logical_not(done), k < n)

        def body(carry):
            rank, _sa, k, _done = carry
            r2 = roll2(rank, k)
            r1s, r2s, ps = distributed_sort(
                (rank, r2, pos), num_keys=3, D=D, axis=axis
            )
            nr_s = _dense_ranks_from_sorted((r1s, r2s), s, D, axis)
            _pp, new_rank = distributed_sort((ps, nr_s), num_keys=1, D=D, axis=axis)
            new_rank = jnp.where(is_pad, pos, new_rank)
            done = real_max_dense(nr_s) == jnp.int32(n - 1)
            return (new_rank, ps, k * 2, done)

        rank_by_pos, sa, _k, _done = lax.while_loop(
            cond, body, (rank_by_pos, p_s, jnp.int32(w), done0)
        )

        # ---- BWT: gather sym[(sa-1) mod n] via two distributed sorts ----
        # route each rank's request to the owner of its target position;
        # targets are a permutation of all N slots (pads request their own
        # slot), so after sorting by target the shard holds exactly its own
        # positions in order -> symbol = sym_local.
        rank_ids = pos
        sorted_is_real = pos < n  # pads occupy the top N-n sorted slots
        target = jnp.where(sorted_is_real,
                           jnp.where(sa == 0, n - 1, sa - 1), pos)
        _tp, req_rank = distributed_sort((target, rank_ids), num_keys=1, D=D, axis=axis)
        _rr, bwt = distributed_sort(
            (req_rank, sym_local), num_keys=1, D=D, axis=axis
        )
        return sa, rank_by_pos, bwt

    return kernel


def suffix_array_sharded(
    symbols, sigma: int, mesh: Mesh, axis: str = AXIS
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sharded circular suffix sort + BWT.

    Returns (sa, rank_by_pos, bwt) as sharded device arrays:
    * sa[r]        — by-rank layout, the circular suffix array
    * rank[i]      — by-position dense rotation ranks (ties possible on
                     periodic texts; sa breaks them by position)
    * bwt[r]       — by-rank layout, sym[(sa[r]-1) mod n]
    """
    D = mesh.devices.size
    n = len(symbols)
    if n >= 2 ** 31:
        raise ValueError(
            "int32 rank space supports n < 2^31; the int64 rank path is a "
            "planned extension")
    sym = np.asarray(symbols, dtype=np.int32)
    if n % D == 0:
        K = n // D
    else:
        # ragged lengths: pad slots carry a copy of the first N-n symbols
        # so packed keys read correct circular successors; the kernel pins
        # pad ranks above every real rank and the wrapper strips them.
        # Keep the pad at least one pack width wide.
        w = min(_pack_width(int(sigma)), (n + D - 1) // D)
        K = -(-(n + w) // D)
        sym = np.concatenate([sym, np.resize(sym, D * K - n)])
    sym_sh = shard_1d(mesh, jnp.asarray(sym), axis)
    kernel = _build_kernel(D, K, n, int(sigma), axis)
    fn = jax.jit(
        jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )
    sa, rank, bwt = fn(sym_sh)
    if D * K != n:
        return sa[:n], rank[:n], bwt[:n]
    return sa, rank, bwt


def sharded_bwt(symbols, sigma: int, mesh: Mesh, axis: str = AXIS):
    """Convenience host wrapper returning numpy (sa, rank, bwt)."""
    sa, rank, bwt = suffix_array_sharded(symbols, sigma, mesh, axis)
    return (np.asarray(sa, dtype=np.int64),
            np.asarray(rank, dtype=np.int64),
            np.asarray(bwt, dtype=np.int32))
