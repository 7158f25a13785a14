from .bitvector import RankBitVector, RLBitVector
from .huffman import HuffmanTree
from .wavelet import HuffmanWaveletTree, RLHuffmanWaveletTree
from .dnarank import DNARank
from .sampled import SampledSA, SampledISA
from .fm import FMIndex
from .cst import CompressedSuffixTree
from .bidir import BidirectionalFMIndex

__all__ = [
    "RankBitVector",
    "RLBitVector",
    "HuffmanTree",
    "HuffmanWaveletTree",
    "RLHuffmanWaveletTree",
    "DNARank",
    "SampledSA",
    "SampledISA",
    "FMIndex",
    "CompressedSuffixTree",
    "BidirectionalFMIndex",
]
