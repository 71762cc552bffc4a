"""Host-side utilities: mixed-radix codecs, RNG, continued fractions, I/O."""

from quantum_basis_tpu.utils.codec import (
    radix_decode,
    radix_encode,
    radix_strides,
)
from quantum_basis_tpu.utils.contfrac import continued_fraction
from quantum_basis_tpu.utils.rng import vec_randomize

__all__ = [
    "radix_decode",
    "radix_encode",
    "radix_strides",
    "continued_fraction",
    "vec_randomize",
]
