"""LCP tools: lcpbit, hwtToLCP, checkLCPBit (SURVEY.md section 1 group 5).

Implemented over the lcp/ module.
"""

from __future__ import annotations

import sys
from typing import List

from ..util.args import ArgParser, ArgInfo
from . import tool


@tool("lcpbit")
def lcpbit(argv: List[str]) -> int:
    """Succinct PLCP bit vector from .bwt + sampled .isa + text
    (reference lcpbit.cpp:3890 driver; ``-test`` runs the self-test
    harness, lcpbit.cpp:4044-4071)."""
    ap = ArgParser(argv)
    if ap.has("test"):
        from ..lcp.selftest import run_selftests
        return run_selftests(verbose=True)
    if len(ap.restargs) < 1:
        sys.stderr.write(
            "usage: lcpbit [-T<tmpprefix>] [-t<threads>] <in.bwt> [out.lcpbit]\n"
            "       lcpbit -test\n")
        return 1
    from ..lcp.plcp import compute_plcp_file
    bwt = ap.restargs[0]
    out = ap.restargs[1] if len(ap.restargs) > 1 else (
        (bwt[:-4] if bwt.endswith(".bwt") else bwt) + ".lcpbit")
    compute_plcp_file(bwt, out)
    return 0


@tool("hwtToLCP")
def hwt_to_lcp(argv: List[str]) -> int:
    """In-memory LCP from the wavelet tree: plain .ulcp, succinct .lcp,
    and RMQ .rmm tree; checklcp=1 cross-checks succinct vs plain
    (reference hwtToLCP.cpp:65-208)."""
    ai = ArgInfo(argv, "hwtToLCP")
    if not ai.restargs:
        sys.stderr.write("usage: hwtToLCP [checklcp=0] <in.bwt>\n")
        return 1
    from ..lcp.wavelet_lcp import hwt_to_lcp_files
    return hwt_to_lcp_files(ai.restargs[0], check=ai.get_bool("checklcp", False))


@tool("checkLCPBit")
def check_lcp_bit(argv: List[str]) -> int:
    """Verify a .lcpbit file: recompute LCP independently and assert
    LCP[i] == PLCPbit[SA[i]] for all i (reference checkLCPBit.cpp:62-82)."""
    ap = ArgParser(argv)
    if len(ap.restargs) < 2:
        sys.stderr.write("usage: checkLCPBit <in.lcpbit> <in.bwt>\n")
        return 1
    from ..lcp.plcp import verify_plcp_file
    ok = verify_plcp_file(ap.restargs[0], ap.restargs[1])
    print("lcpok=%d" % (1 if ok else 0))
    return 0 if ok else 1
