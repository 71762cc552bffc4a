"""Dynamical structure factor: repr-basis results must match full-basis.

The continued-fraction data (norm, alphas, betas) of
G_A(z) = <phi|A' (z-H)^{-1} A|phi> is basis-independent — computing it in
the momentum basis (A_q maps sector k -> k-q) must reproduce the full-basis
computation exactly. This is the framework's analog of the reference's
dual-path checks (SURVEY §4.3).
"""

import numpy as np
import pytest

from quantum_basis_tpu import Mopr, Opr

from models_zoo import SP_HALF, heisenberg_chain, kagome_tj


def _compare_contfrac(nrm_f, a_f, b_f, nrm_r, a_r, b_r, atol=1e-8):
    """Compare continued-fraction data up to the Krylov breakdown point.

    Past breakdown (b ~ 0, invariant subspace exhausted) the coefficients
    are roundoff-determined and legitimately differ between bases."""
    assert abs(nrm_f - nrm_r) < 10 * atol, (nrm_f, nrm_r)
    brk = np.nonzero((np.abs(b_f) < 1e-7) | (np.abs(b_r) < 1e-7))[0]
    mcut = int(brk[0]) if brk.size else len(a_f)
    np.testing.assert_allclose(a_r[:mcut], a_f[:mcut], atol=atol)
    np.testing.assert_allclose(b_r[:mcut], b_f[:mcut], atol=atol)
    assert mcut >= 3  # the comparison must be non-trivial


def _aq(L, q, mat, scale=None, fermion=False, orbital=0):
    out = Mopr()
    for x in range(L):
        out += (np.exp(-1j * 2 * np.pi * q * x / L) / np.sqrt(L)) * Opr(
            x, orbital, fermion, mat)
    return out


def test_szq_dynamics_repr_vs_full():
    L = 10
    q = 3
    m, ops = heisenberg_chain(L)
    # full-basis computation
    m.enumerate_basis_full([ops["Sz"]], [0.0], sec=0)
    m.locate_E0_lanczos("full", nev=1, ncv=1, sec=0)
    E0_full = m.eigenvals_full[0]
    Aq = _aq(L, q, SP_HALF["Sz"])
    nrm_f, a_f, b_f = m.measure_full_dynamic(Aq, 0, 0, 12)

    # momentum-basis computation: the L=10 Heisenberg GS is at k = pi
    # (k = L/2 for L = 2 mod 4); target sector k_gs - q
    k_gs = L // 2
    m.enumerate_basis_repr([k_gs], [ops["Sz"]], [0.0], sec=0)
    m.locate_E0_lanczos("repr", nev=1, sec=0)
    assert abs(m.eigenvals_repr[0] - E0_full) < 1e-9
    m.enumerate_basis_repr([(k_gs - q) % L], [ops["Sz"]], [0.0], sec=1)
    nrm_r, a_r, b_r = m.measure_repr_dynamic(Aq, 0, 1, 12)

    _compare_contfrac(nrm_f, a_f, b_f, nrm_r, a_r, b_r)


def test_smq_dynamics_repr_vs_full_sector_change():
    """S^-_q lowers Sz by 1: target sector has different quantum numbers."""
    L = 8
    q = 1
    m, ops = heisenberg_chain(L)
    m.enumerate_basis_full([ops["Sz"]], [0.0], sec=0)
    m.locate_E0_lanczos("full", nev=1, ncv=1, sec=0)
    m.enumerate_basis_full([ops["Sz"]], [-1.0], sec=1)
    Aq = _aq(L, q, SP_HALF["Sm"])
    nrm_f, a_f, b_f = m.measure_full_dynamic(Aq, 0, 1, 10)

    m.enumerate_basis_repr([0], [ops["Sz"]], [0.0], sec=0)
    m.locate_E0_lanczos("repr", nev=1, sec=0)
    m.enumerate_basis_repr([(-q) % L], [ops["Sz"]], [-1.0], sec=1)
    nrm_r, a_r, b_r = m.measure_repr_dynamic(Aq, 0, 1, 10)

    _compare_contfrac(nrm_f, a_f, b_f, nrm_r, a_r, b_r)


def test_fermionic_dynamics_repr_vs_full():
    """t-J model: fermionic signs in the cross-sector repr application."""
    from models_zoo import TJ_C_UP

    Lx = Ly = 2
    m, ops = kagome_tj(Lx, Ly)
    L_sites = 12
    m.enumerate_basis_full([ops["N"], ops["Sz"]], [8.0, 0.0], sec=0)
    m.locate_E0_lanczos("full", nev=1, ncv=1, sec=0)
    # A = c_up at momentum q=(1,0): removes one up electron
    lat = m.lattice
    Aq = Mopr()
    for s in range(L_sites):
        coor, sub = lat.site2coor(s)
        phase = np.exp(-1j * 2 * np.pi * (1 * coor[0] / Lx + 0 * coor[1] / Ly))
        Aq += (phase / np.sqrt(L_sites)) * Opr(s, 0, True, TJ_C_UP)
    m.enumerate_basis_full([ops["N"], ops["Sz"]], [7.0, -0.5], sec=1)
    nrm_f, a_f, b_f = m.measure_full_dynamic(Aq, 0, 1, 8)

    m.enumerate_basis_repr([0, 0], [ops["N"], ops["Sz"]], [8.0, 0.0], sec=0)
    m.locate_E0_lanczos("repr", nev=1, sec=0)
    m.enumerate_basis_repr([(-1) % Lx, 0], [ops["N"], ops["Sz"]], [7.0, -0.5],
                           sec=1)
    nrm_r, a_r, b_r = m.measure_repr_dynamic(Aq, 0, 1, 8)

    _compare_contfrac(nrm_f, a_f, b_f, nrm_r, a_r, b_r, atol=1e-7)