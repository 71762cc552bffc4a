"""Distributed sample sort vs np.sort on the 8-virtual-device mesh."""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.parallel import basis_mesh
from quantum_basis_tpu.parallel.sample_sort import sample_sort

pytestmark = pytest.mark.multichip


@pytest.mark.parametrize("n", [64, 1000, 40000])
def test_sample_sort_random(n):
    mesh = basis_mesh(8)
    rng = np.random.default_rng(11 + n)
    vals = rng.integers(0, 1 << 48, size=n, dtype=np.int64)
    out = sample_sort(vals, mesh)
    np.testing.assert_array_equal(out, np.sort(vals))


def test_sample_sort_skewed_and_duplicates():
    mesh = basis_mesh(8)
    rng = np.random.default_rng(3)
    # heavy duplication + skew (many equal keys stress the splitters)
    vals = np.concatenate([
        np.zeros(5000, dtype=np.int64),
        rng.integers(0, 100, size=5000, dtype=np.int64),
        rng.integers(1 << 40, (1 << 40) + 50, size=5000, dtype=np.int64),
    ])
    rng.shuffle(vals)
    out = sample_sort(vals, mesh, slack=4.0)
    np.testing.assert_array_equal(out, np.sort(vals))


def test_sample_sort_labels_roundtrip():
    """Sorting enumerated basis labels (the production use)."""
    from quantum_basis_tpu.basis.enumerate import enumerate_basis
    from quantum_basis_tpu.basis.site_basis import SiteBasis
    from quantum_basis_tpu.basis.state import StateSpace
    from quantum_basis_tpu.ops.operators import Mopr, Opr

    L = 14
    SZ = np.array([0.5, -0.5])
    space = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    Sz = Mopr()
    for s in range(L):
        Sz += Opr(s, 0, False, SZ)
    labels = enumerate_basis(space, [Sz], [0.0])
    mesh = basis_mesh(8)
    shuffled = labels.copy()
    np.random.default_rng(0).shuffle(shuffled)
    out = sample_sort(shuffled, mesh)
    np.testing.assert_array_equal(out, labels)


def test_sample_sort_receive_overflow_is_loud():
    """All-equal keys route every element to ONE shard: no send bucket
    overflows, but the receiver gets P full buckets. That must trip the
    overflow flag (-> retry -> RuntimeError), never silently drop data."""
    mesh = basis_mesh(8)
    vals = np.full(2048, 42, dtype=np.int64)
    with pytest.raises(RuntimeError, match="overflow"):
        sample_sort(vals, mesh, slack=2.5)


def test_sample_sort_duplicates_with_enough_slack():
    """Same routing skew, but capacity >= n: must sort correctly."""
    mesh = basis_mesh(8)
    vals = np.full(512, 7, dtype=np.int64)
    out = sample_sort(vals, mesh, slack=8.0)
    np.testing.assert_array_equal(out, np.sort(vals))
