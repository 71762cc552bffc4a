"""Golden-value regression across the reference's example model zoo.

Every expected number is asserted at 1e-8 against the reference's own
example assertions (file:line cited per test); see BASELINE.md.
"""

import numpy as np
import pytest

from quantum_basis_tpu import Opr

from models_zoo import (
    SP_HALF,
    C_UP,
    bose_hubbard_square,
    fermi_hubbard_square,
    heisenberg_chain,
    kagome_heisenberg,
    kagome_tj,
    kondo_chain,
    spinless_fermion_honeycomb,
    triangular_heisenberg,
)


def test_spin1_chain_L10_full():
    """chain_Heisenberg_spin_one.cc:96-97 (trans_absent): E0, E1."""
    m, ops = heisenberg_chain(10, spin="1")
    dim = m.enumerate_basis_full([ops["Sz"]], [0.0])
    assert dim == 8953
    m.locate_E0_lanczos("full", nev=2, ncv=1)
    assert abs(m.eigenvals_full[0] + 14.09412995) < 1e-8
    assert abs(m.eigenvals_full[1] + 13.569322) < 1e-6  # reference quotes 8 digits


@pytest.mark.slow
def test_spin1_chain_L12_momentum():
    """chain_Heisenberg_spin_one.cc:98-102 (trans_symmetric): E0(k), k=0..4."""
    golden = [-16.86955614, -15.2458356, -14.40827083, -14.13433756, -14.54973865]
    m, ops = heisenberg_chain(12, spin="1")
    for k in range(5):
        m.enumerate_basis_repr([k], [ops["Sz"]], [0.0])
        m.locate_E0_lanczos("repr", nev=1)
        assert abs(m.eigenvals_repr[0] - golden[k]) < 1e-8, (k, m.eigenvals_repr[0])


def test_kondo_chain_L4_full():
    """trans_absent chain_Kondo.cc:126-127: L=4, J_K=4, N=4: E0, E1."""
    m, ops = kondo_chain(4, J_Kondo=4.0)
    dim = m.enumerate_basis_full([ops["N"]], [4.0])
    m.locate_E0_lanczos("full", nev=2, ncv=1)
    assert abs(m.eigenvals_full[0] + 12.67762138) < 1e-8
    assert abs(m.eigenvals_full[1] + 9.834798964) < 1e-8


@pytest.mark.slow
def test_kondo_chain_L8_momentum():
    """trans_symmetric chain_Kondo.cc:129-132: J_K=1.1, N=8, Sz=0, k=0..3."""
    golden = [-11.28542034, -11.15505719, -11.05573907, -11.02630258]
    m, ops = kondo_chain(8, J_Kondo=1.1)
    for k in range(4):
        m.enumerate_basis_repr([k], [ops["N"], ops["Sz"]], [8.0, 0.0])
        m.locate_E0_lanczos("repr", nev=1)
        assert abs(m.eigenvals_repr[0] - golden[k]) < 1e-8, (k, m.eigenvals_repr[0])


def test_fermi_hubbard_4x2_full():
    """trans_absent square_Fermi_Hubbard.cc:113: E0 full, 4up 4dn."""
    m, ops = fermi_hubbard_square(4, 2)
    dim = m.enumerate_basis_full([ops["Nup"], ops["Ndn"]], [4.0, 4.0])
    assert dim == 4900
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] + 14.07605866) < 1e-8


@pytest.mark.slow
def test_fermi_hubbard_4x2_momentum_and_measure():
    """trans_symmetric square_Fermi_Hubbard.cc:126-133 + <c+_1 c_5> at :122."""
    golden = {(0, 0): -14.07605866, (0, 1): -10.50470669,
              (1, 0): -12.16861094, (1, 1): -12.19847764,
              (2, 0): -10.54300366, (2, 1): -14.03137587,
              (3, 0): -12.16861094, (3, 1): -12.19847764}
    m, ops = fermi_hubbard_square(4, 2)
    for (kx, ky), want in golden.items():
        m.enumerate_basis_repr([kx, ky], [ops["Nup"], ops["Ndn"]], [4.0, 4.0])
        m.locate_E0_lanczos("repr", nev=1, ncv=1)
        assert abs(m.eigenvals_repr[0] - want) < 1e-8, (kx, ky, m.eigenvals_repr[0])
        if (kx, ky) == (0, 0):
            op = Opr(1, 0, True, C_UP).dagger() * Opr(5, 0, True, C_UP)
            m1 = m.measure_repr_static(op, 0, 0)
            assert abs(m1.real - 0.3957690742) < 1e-8, m1


def test_bose_hubbard_3x3_full():
    """square_Bose_Hubbard.cc:100: Nmax=2, N=9, E0."""
    m, ops = bose_hubbard_square(3, 3, Nmax=2)
    dim = m.enumerate_basis_full([ops["N"]], [9.0])
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] + 25.81136094) < 1e-8


def test_spinless_honeycomb_full_and_momentum():
    """honeycomb_Spinless_Fermion.cc: full E0 (:129 trans_absent) and
    6 momentum sectors (:136-141 trans_symmetric)."""
    m, ops = spinless_fermion_honeycomb(3, 2)
    dim = m.enumerate_basis_full([ops["N"]], [4.0])
    assert dim == 495
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] + 28.60363167) < 1e-8
    golden = {(0, 0): -28.60363167, (0, 1): -28.27163215,
              (1, 0): -28.60363167, (1, 1): -28.27163215,
              (2, 0): -28.60363167, (2, 1): -28.27163215}
    for (kx, ky), want in golden.items():
        m.enumerate_basis_repr([kx, ky], [ops["N"]], [4.0])
        m.locate_E0_lanczos("repr", nev=1)
        assert abs(m.eigenvals_repr[0] - want) < 1e-8, (kx, ky, m.eigenvals_repr[0])


def test_kagome_heisenberg_12_full():
    """kagome_Heisenberg_spin_half.cc:175: 2x2 cells, Sz=0."""
    m, ops = kagome_heisenberg(2, 2)
    dim = m.enumerate_basis_full([ops["Sz"]], [0.0])
    assert dim == 924
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] + 5.444875217) < 1e-8


@pytest.mark.slow
def test_kagome_tj_momentum():
    """kagome_tJ.cc:232 (full E0) and :238-241 (4 momentum sectors)."""
    m, ops = kagome_tj(2, 2)
    golden = {(0, 0): -15.41931496, (0, 1): -14.40277723,
              (1, 0): -14.40277723, (1, 1): -14.40277723}
    for (kx, ky), want in golden.items():
        m.enumerate_basis_repr([kx, ky], [ops["N"], ops["Sz"]], [8.0, 0.0])
        m.locate_E0_lanczos("repr", nev=1)
        assert abs(m.eigenvals_repr[0] - want) < 1e-8, (kx, ky, m.eigenvals_repr[0])


@pytest.mark.slow
def test_triangular_heisenberg_momentum_and_measure():
    """triangular_Heisenberg_spin_half.cc:135-146: E0(k) + correlators."""
    golden = {(0, 0): -8.555514918, (0, 1): -8.002263841, (0, 2): -7.944709784,
              (0, 3): -8.002263841, (1, 2): -7.588987242}
    m, ops = triangular_heisenberg(4, 4)
    for (kx, ky), want in golden.items():
        m.enumerate_basis_repr([kx, ky], [ops["Sz"]], [0.0])
        m.locate_E0_lanczos("repr", nev=1)
        assert abs(m.eigenvals_repr[0] - want) < 1e-8, (kx, ky, m.eigenvals_repr[0])
        if (kx, ky) == (0, 0):
            Sz0Sz1 = Opr(0, 0, False, SP_HALF["Sz"]) * Opr(1, 0, False, SP_HALF["Sz"])
            Sz0Sz2 = Opr(0, 0, False, SP_HALF["Sz"]) * Opr(2, 0, False, SP_HALF["Sz"])
            Sp0Sm1 = Opr(0, 0, False, SP_HALF["Sp"]) * Opr(1, 0, False, SP_HALF["Sm"])
            assert abs(m.measure_repr_static(Sz0Sz1, 0, 0).real + 0.0594132980) < 1e-8
            assert abs(m.measure_repr_static(Sz0Sz2, 0, 0).real - 0.0265006291) < 1e-8
            assert abs(m.measure_repr_static(Sp0Sm1, 0, 0).real + 0.1188265961) < 1e-8