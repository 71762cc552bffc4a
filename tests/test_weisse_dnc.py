"""Divide-and-conquer momentum enumeration vs direct classification.

The reference validates its Weisse path against the direct orbit
classification (dual-path checks, e.g. square_Fermi_Hubbard.cc:158-160);
here the D&C streaming path must reproduce the direct path exactly.
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.basis.enumerate import enumerate_basis
from quantum_basis_tpu.basis.translation import TranslationSet, enumerate_reps
from quantum_basis_tpu.basis.weisse import enumerate_reps_dnc
from tests.models_zoo import (fermi_hubbard_square, heisenberg_chain,
                              kondo_chain, spinless_fermion_honeycomb)


def _compare(m, conserve, vals):
    tset = TranslationSet(m.space, m.lattice)
    labels = enumerate_basis(m.space, conserve, vals)
    direct = enumerate_reps(tset, labels)
    dnc, dim = enumerate_reps_dnc(tset, conserve, vals, with_dim=True,
                                  block=1 << 12)
    assert dim == labels.size
    np.testing.assert_array_equal(direct, dnc)


def test_dnc_chain():
    m, c = heisenberg_chain(12, "1/2")
    _compare(m, [c["Sz"]], [0.0])


def test_dnc_hubbard():
    m, o = fermi_hubbard_square(4, 2)
    _compare(m, [o["Nup"], o["Ndn"]], [4.0, 4.0])


def test_dnc_honeycomb_fermions():
    m, o = spinless_fermion_honeycomb(3, 2)
    _compare(m, [o["N"]], [4.0])


def test_dnc_kondo_two_orbitals():
    m, o = kondo_chain(6, 1.1)
    _compare(m, [o["N"], o["Sz"]], [6.0, 0.0])


def test_dnc_unconstrained():
    m, c = heisenberg_chain(8, "1/2")
    tset = TranslationSet(m.space, m.lattice)
    labels = np.arange(m.space.label_space, dtype=np.int64)
    direct = enumerate_reps(tset, labels)
    dnc = enumerate_reps_dnc(tset, block=1 << 10)
    np.testing.assert_array_equal(direct, dnc)
