"""Operator layer: symbolic algebra, term compilation, device application."""

from quantum_basis_tpu.ops.operators import Opr, OprProd, Mopr

__all__ = ["Opr", "OprProd", "Mopr"]
