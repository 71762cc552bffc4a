"""Generalized Lin tables (reference: src/basis.cc:1193-1348)."""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.basis.enumerate import enumerate_basis
from quantum_basis_tpu.basis.index import BasisIndex
from quantum_basis_tpu.basis.lin_table import (LinTable, LinTableError,
                                               digit_split)
from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace
from tests.models_zoo import SP_HALF
from quantum_basis_tpu.ops.operators import Mopr, Opr, OprProd


def _chain_space(L):
    space = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    Sz = Mopr()
    for x in range(L):
        Sz += Opr(x, 0, False, SP_HALF["Sz"])
    return space, Sz


def test_lin_table_sz_sector_exact():
    L = 12
    space, Sz = _chain_space(L)
    labels = enumerate_basis(space, [Sz], [0.0])
    sa = digit_split(space)
    lt = LinTable(labels, space.label_space, sa)
    # every basis label maps to its own row
    np.testing.assert_array_equal(lt.lookup_np(labels), np.arange(labels.size))
    # tables are sqrt-sized
    assert lt.sa * lt.sb >= space.label_space
    assert max(lt.sa, lt.sb) <= 2 ** ((L + 1) // 2 + 1)


def test_lin_index_device_lookup():
    L = 10
    space, Sz = _chain_space(L)
    labels = enumerate_basis(space, [Sz], [0.0])
    idx = BasisIndex(labels, space.label_space, mode="lin",
                     lin_split=digit_split(space))
    assert idx.mode == "lin"
    j, valid = idx.lookup_checked(np.asarray(labels))
    assert np.all(np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(j), np.arange(labels.size))
    # an out-of-sector label is flagged invalid
    missing = np.asarray([int(labels[0]) + 1], dtype=np.int64)
    while missing[0] in set(labels.tolist()):
        missing[0] += 1
    _, v = idx.lookup_checked(missing)
    assert not bool(np.asarray(v)[0])


def test_lin_fallback_on_inconsistent_basis():
    """A representative subset is generally not Lin-consistent: the
    constructor must detect it (reference falls back to binary search,
    src/model.cc:266-270)."""
    L = 10
    space, Sz = _chain_space(L)
    labels = enumerate_basis(space, [Sz], [0.0])
    rng = np.random.default_rng(0)
    sub = np.sort(rng.choice(labels, size=labels.size // 3, replace=False))
    sa = digit_split(space)
    try:
        lt = LinTable(sub, space.label_space, sa)
        # if by chance consistent, lookups must still be exact
        np.testing.assert_array_equal(lt.lookup_np(sub), np.arange(sub.size))
    except LinTableError:
        pass
    idx = BasisIndex(sub, space.label_space, mode=None, lin_split=sa)
    j, valid = idx.lookup_checked(sub)
    assert np.all(np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(j), np.arange(sub.size))


def test_lin_multi_orbital_kondo_like():
    """Two orbitals (electron x spin) — digit-aligned split still yields a
    consistent Lin table for a particle-number sector."""
    L = 4
    space = StateSpace([(SiteBasis.named("electron"), L),
                        (SiteBasis.named("spin-1/2"), L)])
    Ne = Mopr()
    n_e = np.array([0.0, 1.0, 1.0, 2.0])
    for x in range(L):
        Ne += Opr(x, 0, True, n_e)
    labels = enumerate_basis(space, [Ne], [4.0])
    sa = digit_split(space)
    lt = LinTable(labels, space.label_space, sa)
    np.testing.assert_array_equal(lt.lookup_np(labels), np.arange(labels.size))
