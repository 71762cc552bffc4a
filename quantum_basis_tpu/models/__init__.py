"""Model orchestration layer."""

from quantum_basis_tpu.models.model import Model

__all__ = ["Model"]
