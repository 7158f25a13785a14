"""allHamDna: all-mapper under Hamming distance.

Reference (/root/reference/src/allHamDna.cpp): loads a bidirectional DNA FM
index, calls ``hammingSearchRecUnmapped(pat, maxmis, ...)`` per read
(:158-163), maps SA ranks to positions through the sampled SA (:182-183) and
emits BAM records with NM/MD tags (:198-253). Forward/reverse-complement
handled via strand search.

This rebuild searches the FM index of the pacterm reference with a
branch-and-bound backward search over the 4-base alphabet (mismatch budget),
locates hits through the sampled SA and emits SAM text or, via ``obam=``,
BAM with NM/MD tags through the self-contained BGZF+BAM writer in
``io/bam.py`` (the reference's bambam::BamWriter role).
"""

from __future__ import annotations

import sys
from typing import List, Tuple

import numpy as np

from ..engine.result import BwtResult
from ..index.fm import FMIndex
from ..io.fasta import iter_fasta, iter_fastq
from ..util.log import VerboseLog

_MAP = np.full(256, -1, dtype=np.int8)
for i, ch in enumerate(b"ACGT"):
    _MAP[ch] = i
    _MAP[ch + 32] = i
_BASES = "ACGT"


def _revcomp(codes: np.ndarray) -> np.ndarray:
    return (3 - codes)[::-1]


def hamming_search(fm: FMIndex, pattern: np.ndarray, maxmis: int,
                   shift: int = 1) -> List[Tuple[int, int, int]]:
    """Branch-and-bound backward search; returns (lo, hi, nm) intervals.

    ``shift`` maps 2-bit codes onto the index alphabet (pacterm bases are
    {1..4}). Mirrors ``hammingSearchRecUnmapped`` semantics: all intervals
    of rotations matching the pattern with <= maxmis mismatches.
    """
    out: List[Tuple[int, int, int]] = []
    m = len(pattern)

    def rec(j: int, lo: int, hi: int, nm: int) -> None:
        if hi <= lo:
            return
        if j < 0:
            out.append((lo, hi, nm))
            return
        want = int(pattern[j])
        for c in range(4):
            nm2 = nm + (1 if c != want else 0)
            if nm2 > maxmis:
                continue
            l2, h2 = fm.step(c + shift, lo, hi)
            l2 = int(np.asarray(l2).reshape(-1)[0])
            h2 = int(np.asarray(h2).reshape(-1)[0])
            rec(j - 1, l2, h2, nm2)

    rec(m - 1, 0, fm.n, 0)
    return out


def _md_and_nm(ref_codes: np.ndarray, read_codes: np.ndarray) -> Tuple[str, int]:
    """MD:Z tag + NM for an ungapped alignment (reference computes MD/NM
    at allHamDna.cpp:198-253)."""
    md = []
    run = 0
    nm = 0
    for rc, qc in zip(ref_codes, read_codes):
        if rc == qc:
            run += 1
        else:
            md.append(str(run))
            md.append(_BASES[int(rc)] if 0 <= rc <= 3 else "N")
            run = 0
            nm += 1
    md.append(str(run))
    return "".join(md), nm


def all_ham_dna(bwt_path: str, reads_path: str, maxmis: int = 2,
                out=None, bam_path: str = None) -> int:
    """When ``bam_path`` is given, emit BAM (the reference's output format,
    allHamDna.cpp:198-253, via io/bam.py); otherwise SAM text to ``out``."""
    out = out or sys.stdout
    log = VerboseLog(1)
    result = BwtResult.load(bwt_path)
    if result.sigma != 5:
        log.e("allHamDna expects a pacterm index (sigma=5)")
        return 1
    fm = FMIndex.from_bwt_result(result, structure="hwt")
    if fm.sa is None:
        log.e("no sampled SA: rebuild without bwtonly or run bwtcomputessa")
        return 1
    ref_len = result.n - 1  # excluding terminator

    # reference text codes {0..3} for MD tags
    from ..io.pac import read_pac
    ref_codes = read_pac(result.meta["input"])

    header = ("@HD\tVN:1.6\tSO:unknown\n"
              "@SQ\tSN:ref\tLN:%d\n"
              "@PG\tID:allHamDna\tPN:allHamDna\n" % ref_len)
    bam = None
    if bam_path is not None:
        from ..io.bam import BamWriter
        bam_fh = open(bam_path, "wb")
        bam = BamWriter(bam_fh, [("ref", ref_len)], header)
    else:
        out.write(header)

    def emit(name, flag, pos, m, read_str, nm, md):
        """One ungapped alignment (pos 0-based) or, with pos < 0, an
        unmapped record."""
        if bam is not None:
            if pos < 0:
                bam.write_record(name, 4, -1, -1, 0, [], read_str)
            else:
                bam.write_record(name, flag, 0, pos, 255, [(m, "M")],
                                 read_str, tags={"NM": nm, "MD": md})
            return
        if pos < 0:
            out.write("%s\t4\t*\t0\t0\t*\t*\t0\t0\t%s\t*\n" % (name, read_str))
        else:
            out.write(
                "%s\t%d\tref\t%d\t255\t%dM\t*\t0\t0\t%s\t*\tNM:i:%d\tMD:Z:%s\n"
                % (name, flag, pos + 1, m, read_str, nm, md))

    def reads():
        if reads_path.endswith((".fq", ".fastq", ".fq.gz", ".fastq.gz")):
            for name, seq, _q in iter_fastq(reads_path):
                yield name, seq
        else:
            yield from iter_fasta(reads_path)

    nreads = nhits = 0
    for name, seq in reads():
        nreads += 1
        codes = _MAP[np.frombuffer(seq, dtype=np.uint8)].astype(np.int64)
        if (codes < 0).any():
            continue
        m = len(codes)
        found = False
        for strand, pat in ((0, codes), (16, _revcomp(codes))):
            intervals = hamming_search(fm, pat, maxmis)
            all_ranks = np.concatenate(
                [np.arange(lo, hi) for lo, hi, _nm in intervals]
            ) if intervals else np.zeros(0, np.int64)
            if not len(all_ranks):
                continue
            positions = fm.locate_batch(all_ranks)  # all hits walk together
            read_str = "".join(_BASES[int(c)] for c in pat)
            for pos in sorted(int(p) for p in positions):
                if pos + m > ref_len:  # spans the terminator: not a hit
                    continue
                ref_win = ref_codes[pos : pos + m]
                md, nm = _md_and_nm(ref_win, pat)
                emit(name, strand, pos, m, read_str, nm, md)
                nhits += 1
                found = True
        if not found:
            emit(name, 4, -1, m, seq.decode(), 0, "")
    if bam is not None:
        bam.close()
        bam_fh.close()
    log.v("allHamDna: %d reads, %d alignments" % (nreads, nhits))
    return 0
