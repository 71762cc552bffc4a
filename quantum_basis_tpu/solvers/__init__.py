"""Native JAX Krylov suite — replaces MKL LAPACK / ARPACK-NG / FEAST."""

from quantum_basis_tpu.solvers.lanczos import (
    lanczos_dynamics,
    lanczos_ground,
    energy_scale,
)

__all__ = ["lanczos_ground", "lanczos_dynamics", "energy_scale"]
