from .options import BwtOptions
from .api import compute_bwt
from .result import BwtResult
from .verify import check_bwt
from .ssa import compute_ssa

__all__ = ["BwtOptions", "compute_bwt", "BwtResult", "check_bwt", "compute_ssa"]
