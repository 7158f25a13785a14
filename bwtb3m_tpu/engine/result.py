"""Construction result manifest — equivalent of ``BwtMergeSortResult``.

The reference returns a manifest naming the produced files and offers
``loadLF`` to build the rank/LF structure from them
(/root/reference/src/checkbwt.cpp:39-53,165). Here the manifest is the JSON
``.meta`` file plus this class, and ``load_occ`` builds the device occ table.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..io import formats
from ..io.rl import open_bwt
from ..ops.rank import build_occ

# one-entry focc memo shared across BwtResult instances (see load_focc)
_FOCC_CACHE: dict = {}

# device-rows hand-off from the merge engine: compute_bwt registers the
# final region's packed device rows here (keyed like _FOCC_CACHE) so an
# in-process checkbwt/bwtcomputessa builds the rank structure straight
# from HBM instead of re-uploading the .bwt through the relay.  The rows
# hold the engine's DENSE symbols (bit-plane-eligible sigma <= 8, all
# present); when the engine ran rank-compacted, the entry carries the
# symmap so the hit mirrors _build_focc(dense=True) exactly.
_ROWS_CACHE: dict = {}


def register_device_rows(bwt_path: str, handle, n: int, sigma: int,
                         hist: np.ndarray, symmap=None) -> None:
    """Bind a ``DeviceRowsHandle`` to the freshly written ``.bwt``.

    The handle carries the identity of the build that produced the rows
    (n, dense sigma, BWT symbol histogram); binding is refused unless
    all three match the file's stats, so rows can never be registered
    against a ``.bwt`` from a different build (the round-4 silent-
    corruption path, VERDICT r4 weak #1).  ``symmap`` maps the rows'
    dense symbol ids back to the file's symbols when the engine ran
    rank-compacted (engine/api.py alphabet compaction); the stored hit
    then mirrors what ``_build_focc(dense=True)`` would return."""
    import os
    h = np.asarray(handle.hist, np.int64)
    b = np.asarray(hist, np.int64)
    if symmap is None:
        if handle.n != n or handle.sigma != sigma:
            raise ValueError(
                "device-rows handle identity mismatch: handle (n=%d, "
                "sigma=%d) vs build (n=%d, sigma=%d)"
                % (handle.n, handle.sigma, n, sigma))
        if len(h) != len(b) or not np.array_equal(h, b):
            raise ValueError("device-rows handle histogram mismatch")
    else:
        sm = np.asarray(symmap, np.int64)
        if handle.n != n or handle.sigma != len(sm):
            raise ValueError(
                "device-rows handle identity mismatch under symmap: "
                "handle (n=%d, sigma=%d) vs build (n=%d, |symmap|=%d)"
                % (handle.n, handle.sigma, n, len(sm)))
        # the file's histogram restricted to the mapped symbols must be
        # the dense histogram, and carry ALL the mass
        if (sm.max(initial=-1) >= len(b)
                or not np.array_equal(b[sm], h)
                or int(b.sum()) != int(h.sum())):
            raise ValueError("device-rows handle histogram mismatch "
                             "under symmap")
    st = os.stat(bwt_path)
    key = (os.path.abspath(bwt_path), st.st_mtime_ns, st.st_size, True)
    _ROWS_CACHE.clear()    # hold at most one
    _ROWS_CACHE[key] = (handle.rows, n, handle.sigma,
                        None if symmap is None
                        else np.asarray(symmap, np.int64).copy())


def clear_caches() -> None:
    """Drop the focc memo and any pending device-rows hand-off (used by
    the test suite between tests; safe any time — both are caches)."""
    _FOCC_CACHE.clear()
    _ROWS_CACHE.clear()


class BwtResult:
    def __init__(self, meta: dict):
        self.meta = meta

    @classmethod
    def load(cls, bwt_path: str) -> "BwtResult":
        base = bwt_path[:-4] if bwt_path.endswith(".bwt") else bwt_path
        return cls(formats.read_meta(base + ".meta"))

    # ---- file accessors -------------------------------------------------
    @property
    def bwt_path(self) -> str:
        return self.meta["files"]["bwt"]

    @property
    def hist_path(self) -> str:
        return self.meta["files"]["hist"]

    @property
    def preisa_path(self) -> str:
        return self.meta["files"]["preisa"]

    @property
    def sa_path(self) -> Optional[str]:
        return self.meta["files"].get("sa")

    @property
    def isa_path(self) -> Optional[str]:
        return self.meta["files"].get("isa")

    @property
    def n(self) -> int:
        return self.meta["n"]

    @property
    def sigma(self) -> int:
        return self.meta["sigma"]

    # ---- loading --------------------------------------------------------
    def load_bwt(self) -> np.ndarray:
        with open_bwt(self.bwt_path) as r:
            return r.decode_all()

    def load_occ(self, dense: bool = True, packed: bool = True):
        """Build the device occ/rank structure from .bwt (reference
        ``res.loadLF`` role). Returns (occ table, symbol_map or None):
        when ``dense`` and the alphabet is sparse, symbols are densified
        and ``symbol_map[dense_id] = original symbol``. ``packed`` selects
        the bit-plane popcount structure (bandwidth-optimal)."""
        bwt = self.load_bwt()
        sigma = self.sigma
        symmap = None
        if dense:
            present = np.unique(bwt)
            if len(present) and (len(present) < sigma
                                 or present[-1] >= len(present)):
                remap = np.zeros(max(sigma, int(present[-1]) + 1), dtype=np.int32)
                remap[present] = np.arange(len(present), dtype=np.int32)
                bwt = remap[bwt]
                sigma = len(present)
                symmap = present.astype(np.int64)
        # ship the BWT to the device bit-packed (k-bit) and unpack there:
        # host->device transfer is 8/bits x smaller, which dominates for
        # remote-attached devices at 100M+ symbols
        import math as _math

        import jax.numpy as jnp

        from ..io.compact import pack_bits
        from ..ops.pack import unpack_bits_device

        bits = max(1, _math.ceil(_math.log2(max(2, sigma))))
        if bits <= 8:
            packed_bytes = pack_bits(bwt, bits)
            bwt_dev = unpack_bits_device(jnp.asarray(packed_bytes), bits, len(bwt))
        else:
            bwt_dev = jnp.asarray(bwt.astype(np.int32))
        if packed and sigma <= 256:
            from ..ops.rank_packed import build_occ_packed
            occt = build_occ_packed(bwt_dev, sigma)
        else:
            occt = build_occ(bwt_dev, sigma)
        return occt, symmap

    def load_focc(self, dense: bool = True):
        """Build the fused single-gather rank structure (ops/focc.py) from
        .bwt — the uint32 path every walk kernel (checkbwt, bwtcomputessa,
        gap chains) now runs on; no 2^31 rank ceiling. Returns
        (FusedOcc, symbol_map or None).

        Results are memoized per (path, mtime, size, dense): building +
        shipping the rows dominates a verify/ssa pipeline leg (BENCH.md
        round 3, 47-154 s at 256M through the relay), and checkbwt +
        bwtcomputessa in one process would otherwise each rebuild the
        same structure — the role of the reference's freshness-checked
        .hwt reuse (/root/reference/src/checkbwt.cpp:46-53)."""
        import os
        st = os.stat(self.bwt_path)
        # the built structure depends on the wide/narrow variant too
        # (BWTB3M_FORCE_WIDE or n >= 2^32 selects the two-word occ):
        # a cached narrow structure must never satisfy a wide request
        # (ADVICE r4: the test_wideocc failure mode)
        wide = bool(self.n >= (1 << 32)
                    or os.environ.get("BWTB3M_FORCE_WIDE"))
        key = (os.path.abspath(self.bwt_path), st.st_mtime_ns, st.st_size,
               bool(dense), wide)
        hit = _FOCC_CACHE.get(key)
        if hit is not None:
            return hit
        rows_key = key[:4]
        # a symmap'd hit IS the dense structure, so only dense requests
        # may consume it (and wide requests never can — narrow rows)
        rows_hit = None if wide else _ROWS_CACHE.get(rows_key)
        if rows_hit is not None:
            rows, n, dsigma, symmap = rows_hit
            if n == self.n and (symmap is not None or dsigma == self.sigma) \
                    and (symmap is None or dense):
                _ROWS_CACHE.pop(rows_key, None)
                from ..ops.focc_build import build_focc_from_rows
                out = (build_focc_from_rows(rows, n, dsigma), symmap)
            else:
                rows_hit = None
        if rows_hit is None:
            out = self._build_focc(dense)
        _FOCC_CACHE.clear()   # hold at most one (rows are ~1 B/symbol HBM)
        _FOCC_CACHE[key] = out
        return out

    def _build_focc(self, dense: bool):
        bwt = None
        with open_bwt(self.bwt_path) as r:
            if hasattr(r, "decode_all_u8"):
                bwt = r.decode_all_u8()  # native stream decode, no int32 copy
        if bwt is None:
            bwt = self.load_bwt()
        sigma = self.sigma
        symmap = None
        if dense:
            present = np.unique(bwt)
            if len(present) and (len(present) < sigma
                                 or present[-1] >= len(present)):
                remap = np.zeros(max(sigma, int(present[-1]) + 1), dtype=np.int32)
                remap[present] = np.arange(len(present), dtype=np.int32)
                bwt = remap[bwt]
                sigma = len(present)
                symmap = present.astype(np.int64)
        from ..ops.focc_build import build_focc_host

        # chunked streaming build: bit-packed per-chunk transfers, O(chunk)
        # device transients, and no flat device array — the monolithic
        # builder silently breaks past 2^31 symbols (flat-buffer limit)
        # and stages 4 B/symbol of int32 transients
        bwt = np.asarray(bwt, dtype=np.uint8)
        import os
        if self.n >= (1 << 32) or os.environ.get("BWTB3M_FORCE_WIDE"):
            # stored occ lo words wrap past 2^32: derive the hi words from
            # the per-chunk bases and return the two-word structure
            # (BWTB3M_FORCE_WIDE drives the wide walk kernels on small
            # inputs for tests — hi words are all zero there)
            from ..ops.wideocc import widen_focc
            focc, bases, g = build_focc_host(bwt, sigma, return_bases=True)
            return widen_focc(focc, bases, g, self.n), symmap
        return build_focc_host(bwt, sigma), symmap

    def load_preisa(self):
        return formats.read_preisa(self.preisa_path)
