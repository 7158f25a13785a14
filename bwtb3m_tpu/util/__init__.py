from .args import ArgInfo, ArgParser, parse_size
from .log import VerboseLog, RealTimeClock, mem_usage_string
from .tmpfiles import TempFileNameGenerator, TempFileRemovalContainer

__all__ = [
    "ArgInfo",
    "ArgParser",
    "parse_size",
    "VerboseLog",
    "RealTimeClock",
    "mem_usage_string",
    "TempFileNameGenerator",
    "TempFileRemovalContainer",
]
