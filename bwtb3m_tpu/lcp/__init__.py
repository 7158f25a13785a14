from .plcp import (PLCPBitDecoder, compute_plcp, encode_plcp_bits,
                   decode_plcp_bits)
from .rmm import RMMTree

__all__ = [
    "PLCPBitDecoder",
    "compute_plcp",
    "encode_plcp_bits",
    "decode_plcp_bits",
    "RMMTree",
]
