"""Batched LF mapping and backward search steps.

TPU-native equivalents of the reference's LF layer
(``lf::ImpCompactHuffmanWaveletLF::extendedLF`` used by the checkbwt walk,
/root/reference/src/checkbwt.cpp:202; ``step(sym, lo, hi)`` backward search,
/root/reference/src/probeScanDna.cpp:100-107). All entry points operate on
batches of lanes so thousands of independent walks keep the chip busy —
the scaled-up version of the interleaved-walk design measured by
/root/reference/src/bwttestdecodespeed.cpp:67-97.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .rank import OccTable, access_batch, rank_batch


def lf_step_batch(occt: OccTable, r: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extended LF for a batch of ranks: returns (sym, r') with
    r' = C[sym] + rank(sym, r) — one backwards step of every lane's walk."""
    sym = access_batch(occt, r)
    r2 = occt.C[sym] + rank_batch(occt, sym, r)
    return sym, r2


def backward_search_step(
    occt: OccTable, c: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched FM backward-search step: interval of suffixes prefixed by
    c · current-pattern. lo/hi are half-open rank intervals."""
    lo2 = occt.C[c] + rank_batch(occt, c, lo)
    hi2 = occt.C[c] + rank_batch(occt, c, hi)
    return lo2, hi2


def lf_walk(
    occt: OccTable, r0: jnp.ndarray, steps: int, record_every: int = 0
):
    """Walk LF backwards ``steps`` times from each lane's starting rank.

    Returns final ranks [B] and, when record_every > 0, the recorded
    (step, rank) trace [B, steps//record_every].
    """
    B = r0.shape[0]

    if record_every:
        ntr = steps // record_every

        def body(i, carry):
            r, trace = carry
            _sym, r2 = lf_step_batch(occt, r)
            ti = i // record_every
            write = (i % record_every) == 0
            trace = lax.cond(
                write,
                lambda t: lax.dynamic_update_index_in_dim(t, r, ti, axis=1),
                lambda t: t,
                trace,
            )
            return (r2, trace)

        trace0 = jnp.zeros((B, max(1, ntr)), jnp.int32)
        r, trace = lax.fori_loop(0, steps, body, (r0, trace0))
        return r, trace

    def body(_i, r):
        _sym, r2 = lf_step_batch(occt, r)
        return r2

    return lax.fori_loop(0, steps, body, r0), None
