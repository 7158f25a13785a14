from .doubling import suffix_array, suffix_array_jax, bwt_from_sa
from .rank import OccTable, build_occ
from .lf import lf_step_batch, backward_search_step

__all__ = [
    "suffix_array",
    "suffix_array_jax",
    "bwt_from_sa",
    "OccTable",
    "build_occ",
    "lf_step_batch",
    "backward_search_step",
]
