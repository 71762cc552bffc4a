"""Basis layer: local orbitals, state-label codec, enumeration, symmetry."""

from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace

__all__ = ["SiteBasis", "StateSpace"]
