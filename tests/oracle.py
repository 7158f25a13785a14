"""Brute-force oracles for correctness tests.

The reference tests against in-RAM ground truth built with divsufsort + Kasai
(/root/reference/src/lcpbit.cpp:3658-3739). Here the ground truth for the
*circular* BWT semantics is built by literally sorting all rotations.
"""

from __future__ import annotations

import numpy as np


def naive_circular_sa(text) -> np.ndarray:
    """Sort all rotations of `text`; ties broken by start position."""
    t = list(np.asarray(text).tolist())
    n = len(t)
    rotations = [tuple(t[i:] + t[:i]) for i in range(n)]
    order = sorted(range(n), key=lambda i: (rotations[i], i))
    return np.array(order, dtype=np.int64)


def naive_bwt(text) -> np.ndarray:
    t = np.asarray(text)
    n = len(t)
    sa = naive_circular_sa(t)
    return t[(sa - 1) % n].astype(np.int32)


def naive_isa(text) -> np.ndarray:
    sa = naive_circular_sa(text)
    isa = np.zeros(len(sa), dtype=np.int64)
    isa[sa] = np.arange(len(sa))
    return isa


def all_strings(length: int, sigma: int):
    """Exhaustively enumerate all strings of `length` over `sigma` symbols
    (reference testnk style, /root/reference/src/lcpbit.cpp:3777-3794)."""
    if length == 0:
        yield np.zeros(0, dtype=np.int32)
        return
    total = sigma ** length
    for v in range(total):
        s = np.zeros(length, dtype=np.int32)
        x = v
        for i in range(length):
            s[i] = x % sigma
            x //= sigma
        yield s


def random_string(n: int, sigma: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, sigma, size=n, dtype=np.int32)
