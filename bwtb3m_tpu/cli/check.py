"""Verification / decoding tools: checkbwt, bwtb3mdecoderl, bwtdecodeblock.

SURVEY.md section 1 group 6.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..engine.result import BwtResult
from ..engine.verify import check_bwt
from ..index.fm import FMIndex
from ..io.inputtypes import parse_input_type
from ..io.rl import open_bwt
from ..util.args import ArgInfo
from ..util.log import VerboseLog
from . import tool


@tool("checkbwt")
def checkbwt(argv: List[str]) -> int:
    """Full-text verification: LF-walk the whole text backwards and compare
    every symbol against the original input (reference checkbwt.cpp:27-241);
    prints ``gok=1`` on success, exits nonzero on failure."""
    ai = ArgInfo(argv, "checkbwt")
    if len(ai.restargs) < 2:
        sys.stderr.write(
            "usage: checkbwt inputtype=<type> <input> <in.bwt>\n")
        return 1
    itype = parse_input_type(ai.get("inputtype", "bytestream"))
    text, _sigma = itype.load(ai.restargs[0])
    result = BwtResult.load(ai.restargs[1])
    log = VerboseLog(ai.get_int("verbose", 1))
    ok = check_bwt(result, text, log=log)
    print("gok=%d" % (1 if ok else 0))
    return 0 if ok else 1


@tool("bwtb3mdecoderl")
def bwtb3m_decode_rl(argv: List[str]) -> int:
    """Decode .bwt (RL) back to a byte stream on stdout
    (reference bwtb3mdecoderl.cpp:27-47 decodeRun loop)."""
    ai = ArgInfo(argv, "bwtb3mdecoderl")
    if not ai.restargs:
        sys.stderr.write("usage: bwtb3mdecoderl [format=bytestream|utf-8] <in.bwt>\n")
        return 1
    fmt = ai.get("format", "bytestream")
    with open_bwt(ai.restargs[0]) as r:
        out = sys.stdout.buffer
        for b in range(r.nb):
            block = r.decode_block(b)
            if fmt == "utf-8":
                out.write("".join(chr(int(c)) for c in block).encode("utf-8"))
            else:
                out.write(block.astype(np.uint8).tobytes())
    return 0


@tool("bwtdecodeblock")
def bwt_decode_block(argv: List[str]) -> int:
    """Random-access decode of text range [low, low+len) from the FM index
    files, asserting against the original input when given (reference
    bwtdecodeblock.cpp: SparseRank + LF walk back from the next ISA sample;
    our RLB1 block count table plays the .sparserank role)."""
    ai = ArgInfo(argv, "bwtdecodeblock")
    if len(ai.restargs) < 3:
        sys.stderr.write(
            "usage: bwtdecodeblock [inputtype=..] [ref=<input>] "
            "<in.bwt> <low> <len>\n")
        return 1
    bwt_path = ai.restargs[0]
    low = int(ai.restargs[1])
    length = int(ai.restargs[2])
    result = BwtResult.load(bwt_path)
    fm = FMIndex.from_bwt_result(result, structure="hwt")
    if fm.isa is None:
        sys.stderr.write("bwtdecodeblock: no .isa sidecar (run without bwtonly)\n")
        return 1
    out = fm.extract(low, length)
    if ai.has("ref"):
        itype = parse_input_type(ai.get("inputtype", "bytestream"))
        text, _sigma = itype.load(ai.get("ref"))
        expect = np.take(text, (low + np.arange(length)) % len(text))
        if not np.array_equal(out, expect):
            sys.stderr.write("bwtdecodeblock: MISMATCH vs reference input\n")
            return 1
    sys.stdout.buffer.write(out.astype(np.uint8).tobytes())
    return 0
