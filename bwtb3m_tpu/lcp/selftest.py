"""lcpbit -test: built-in self-test harness with brute-force oracles.

Mirrors the reference's harness (/root/reference/src/lcpbit.cpp:4044-4071):
the fixed tiny string "abbab#", exhaustive enumeration of small strings over
small alphabets (testnk), random strings over an 8-char alphabet at growing
lengths (testrandomn), and a real file (the reference uses its own
"configure" script; we use this module's source). Ground truth is built
in RAM (rotation sort + Phi/Kasai) and every succinct entry is asserted.
"""

from __future__ import annotations

import itertools
import os
import tempfile

import numpy as np

from .plcp import (compute_plcp, decode_plcp_bits, encode_plcp_bits,
                   kasai_plcp, write_plcp_file, PLCPBitDecoder)


def _naive_sa(text: np.ndarray) -> np.ndarray:
    t = list(np.asarray(text).tolist())
    n = len(t)
    rotations = [tuple(t[i:] + t[:i]) for i in range(n)]
    return np.array(sorted(range(n), key=lambda i: (rotations[i], i)),
                    dtype=np.int64)


def _check_one(text: np.ndarray, verbose: bool = False) -> None:
    text = np.asarray(text, dtype=np.int32)
    sigma = int(text.max()) + 1 if len(text) else 1
    plcp, sa = compute_plcp(text, sigma)
    ref = kasai_plcp(text, _naive_sa(text))
    assert np.array_equal(plcp, ref), (
        "PLCP mismatch for text %r:\n got %r\n ref %r"
        % (text.tolist(), plcp.tolist(), ref.tolist()))
    # succinct round trip
    bits = encode_plcp_bits(plcp)
    back = decode_plcp_bits(bits, len(plcp))
    assert np.array_equal(back, plcp)
    # file round trip
    with tempfile.NamedTemporaryFile(suffix=".lcpbit", delete=False) as f:
        path = f.name
    try:
        write_plcp_file(path, plcp)
        dec = PLCPBitDecoder(path, n=len(plcp))
        assert np.array_equal(dec.all(), plcp)
    finally:
        os.unlink(path)


def testn(text, verbose=False):
    _check_one(np.asarray(text, dtype=np.int32), verbose)


def testnk(length: int, sigma: int, verbose=False):
    """Exhaustive test of all strings of `length` over `sigma` symbols
    (reference lcpbit.cpp:3777-3794)."""
    for tup in itertools.product(range(sigma), repeat=length):
        _check_one(np.array(tup, dtype=np.int32))


def testrandomn(n: int, sigma: int = 8, seed: int = 0, verbose=False):
    rng = np.random.default_rng(seed)
    _check_one(rng.integers(0, sigma, n, dtype=np.int32))


def testnxz(path: str, limit: int = 1 << 16, verbose=False):
    """Real-genome fixture test: decompress an .xz file and check a
    prefix (reference testnXz, lcpbit.cpp:3817: skip if absent)."""
    import lzma

    if not os.path.exists(path):
        return False
    with lzma.open(path, "rb") as f:
        data = np.frombuffer(f.read(limit), dtype=np.uint8).astype(np.int32)
    if len(data):
        _check_one(data[:limit])
    return True


def run_selftests(verbose: bool = False) -> int:
    # fixed tiny case (reference lcpbit.cpp:4053 "abbab#")
    testn([ord(c) for c in "abbab#"], verbose)
    # exhaustive tiny
    testnk(6, 2, verbose)
    testnk(4, 3, verbose)
    # random at growing sizes (trimmed vs the reference's 128M ceiling to
    # keep the self-test interactive; bench covers large sizes)
    for n in (1024, 4096, 16384):
        testrandomn(n, 8, seed=n, verbose=verbose)
    # a real text file: this module's own source
    with open(__file__, "rb") as f:
        data = np.frombuffer(f.read(), dtype=np.uint8).astype(np.int32)
    _check_one(data[:4096])
    # real-genome fixtures if present (reference expects testdata/*.xz and
    # skips when absent, lcpbit.cpp:3817,4068-4070)
    for fix in ("testdata/hg19_000000.xz", "testdata/dmel_test.xz",
                "testdata/ecoli_test.xz"):
        if testnxz(fix) and verbose:
            print("fixture %s ok" % fix)
    if verbose:
        print("lcpbit selftests ok")
    return 0
