from .mesh import make_mesh
from .doubling import suffix_array_sharded, sharded_bwt

__all__ = ["make_mesh", "suffix_array_sharded", "sharded_bwt"]
