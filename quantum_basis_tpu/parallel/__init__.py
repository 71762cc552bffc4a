"""Multi-chip distribution: mesh construction and sharded operator apply."""

from quantum_basis_tpu.parallel.mesh import basis_mesh
from quantum_basis_tpu.parallel.apply_sharded import MatvecSharded

__all__ = ["basis_mesh", "MatvecSharded"]
