from .mesh import chain_mesh, tempering_mesh
from .chain_array import ChainArray
from .tempering import ShardedTempering

__all__ = ["chain_mesh", "tempering_mesh", "ChainArray", "ShardedTempering"]
