"""Lattice geometry: named Bravais lattices, TOML clusters, symmetry plans."""

from quantum_basis_tpu.lattice.lattice import Lattice

__all__ = ["Lattice"]
