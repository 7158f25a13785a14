"""SA/ISA derivation tools: bwtcomputessa, hwtPreIsaToIsa, sortPreIsa,
sasubsample (SURVEY.md section 1 group 3)."""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..engine.ssa import compute_isa_from_preisa, compute_ssa
from ..io import formats
from ..util.args import ArgInfo
from ..util.log import VerboseLog
from . import tool


@tool("bwtcomputessa")
def bwtcomputessa(argv: List[str]) -> int:
    """Sampled SA + ISA from .bwt + .preisa without re-sorting
    (reference bwtcomputessa.cpp:39-51 argument surface)."""
    ai = ArgInfo(argv, "bwtcomputessa")
    if not ai.restargs:
        sys.stderr.write(
            "usage: bwtcomputessa [sasamplingrate=32] [isasamplingrate=32] "
            "[tmpprefix=..] [copyinputtomemory=0] [threads=8] [maxsortmem=2G] "
            "[maxtmpfiles=1024] [ref_isa=..] [ref_sa=..] <in.bwt>\n")
        return 1
    compute_ssa(
        ai.restargs[0],
        sa_sampling_rate=ai.get_int("sasamplingrate", 32),
        isa_sampling_rate=ai.get_int("isasamplingrate", 32),
        tmp_prefix=ai.get("tmpprefix") or None,
        copy_input_to_memory=ai.get_bool("copyinputtomemory", False),
        num_threads=ai.get_int("threads", 8),
        max_sort_mem=ai.get_int("maxsortmem", 2 * 1024 ** 3),
        max_tmp_files=ai.get_int("maxtmpfiles", 1024),
        log=VerboseLog(ai.get_int("verbose", 1)),
        ref_isa=ai.get("ref_isa") or None,
        ref_sa=ai.get("ref_sa") or None,
    )
    return 0


@tool("hwtPreIsaToIsa")
def hwt_preisa_to_isa(argv: List[str]) -> int:
    """.bwt + .preisa -> .isa at a chosen power-of-two rate
    (reference hwtPreIsaToIsa.cpp; default rate 64)."""
    ai = ArgInfo(argv, "hwtPreIsaToIsa")
    if not ai.restargs:
        sys.stderr.write("usage: hwtPreIsaToIsa [isasamplingrate=64] <in.bwt>\n")
        return 1
    rate = ai.get_int("isasamplingrate", 64)
    if rate & (rate - 1):
        sys.stderr.write("isasamplingrate must be a power of two\n")
        return 1
    compute_isa_from_preisa(ai.restargs[0], isa_sampling_rate=rate,
                            log=VerboseLog(ai.get_int("verbose", 1)))
    return 0


@tool("sortPreIsa")
def sort_preisa(argv: List[str]) -> int:
    """Sort .preisa (rank, pos) pairs by position, verify strictly
    increasing positions, report the sampling-gap histogram, write the
    sorted pair file (reference sortPreIsa.cpp:46-131)."""
    ai = ArgInfo(argv, "sortPreIsa")
    if not ai.restargs:
        sys.stderr.write("usage: sortPreIsa [outputfilename=..] <in.preisa>\n")
        return 1
    inp = ai.restargs[0]
    out = ai.get("outputfilename") or (inp + ".sorted")
    log = VerboseLog(ai.get_int("verbose", 1))
    ranks, poss, rate = formats.read_preisa(inp)
    order = np.argsort(poss, kind="stable")
    poss, ranks = poss[order], ranks[order]
    if len(poss) > 1 and (np.diff(poss) <= 0).any():
        log.e("positions are not strictly increasing after sort")
        return 1
    gaps = np.diff(poss)
    if len(gaps):
        uniq, cnt = np.unique(gaps, return_counts=True)
        for g, c in zip(uniq.tolist(), cnt.tolist()):
            log.v("gap[%d]=%d" % (g, c))
    formats.write_preisa(out, ranks, poss, rate or 0)
    log.v("wrote %s (%d pairs)" % (out, len(poss)))
    return 0


@tool("sasubsample")
def sasubsample(argv: List[str]) -> int:
    """Subsample a sampled SA by a power-of-two factor -s: rate *= s,
    keep every s-th value (reference sasubsample.cpp:43-58)."""
    from ..util.args import ArgParser

    ap = ArgParser(argv)
    s = ap.get_int("s", 1)
    if s < 1 or (s & (s - 1)):
        sys.stderr.write("sasubsample: -s must be a power of two >= 1\n")
        return 1
    if len(ap.restargs) < 2:
        sys.stderr.write("usage: sasubsample -s<factor> <in.sa> <out.sa>\n")
        return 1
    rate, values = formats.read_sampled_array(ap.restargs[0])
    formats.write_sampled_array(ap.restargs[1], rate * s, values[::s])
    return 0
