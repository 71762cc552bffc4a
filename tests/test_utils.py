"""Unit tests for codecs, RNG, continued fractions."""

import numpy as np
import pytest

from quantum_basis_tpu.utils.codec import (
    code_space_size,
    radix_decode,
    radix_encode,
    radix_strides,
)
from quantum_basis_tpu.utils.contfrac import continued_fraction, greens_function
from quantum_basis_tpu.utils.rng import vec_randomize


def test_radix_roundtrip():
    base = [3, 2, 5, 4]
    n = code_space_size(base)
    assert n == 120
    codes = np.arange(n)
    digits = radix_decode(codes, base)
    assert digits.shape == (n, 4)
    back = radix_encode(digits, base)
    np.testing.assert_array_equal(back, codes)
    # digit 0 least significant
    assert digits[1, 0] == 1 and digits[1, 1] == 0
    assert radix_strides(base).tolist() == [1, 3, 6, 30]


def test_radix_overflow_guard():
    with pytest.raises(OverflowError):
        radix_strides([256] * 9)  # 2^72 > int64


def test_vec_randomize_normalized_and_deterministic():
    r1, i1 = vec_randomize(1000, seed=1)
    r2, _ = vec_randomize(1000, seed=1)
    assert i1 is None
    np.testing.assert_allclose(np.linalg.norm(r1), 1.0, atol=1e-13)
    np.testing.assert_array_equal(r1, r2)
    r3, i3 = vec_randomize(64, seed=3, complex_valued=True)
    np.testing.assert_allclose(np.sqrt(np.sum(r3**2 + i3**2)), 1.0, atol=1e-13)
    r0, _ = vec_randomize(16, seed=0)
    np.testing.assert_allclose(r0, 0.25)


def test_continued_fraction():
    # 1 + 1/(2 + 1/2) = 1.4
    assert abs(continued_fraction([1.0, 2.0, 2.0], [0.0, 1.0, 1.0]) - 1.4) < 1e-14
    # resolvent of a 1x1 "matrix" a0: G = 1/(z - a0)
    z = np.array([2.0 + 1e-2j])
    g = greens_function(z, 1.0, [0.5], [0.0])
    np.testing.assert_allclose(g, 1.0 / (z - 0.5), rtol=1e-14)
