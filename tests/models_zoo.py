"""Builders for the reference's example models (shared by golden tests).

Each builder reproduces the exact Hamiltonian of the corresponding
reference driver (file cited per function) so the golden energies apply.
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu import Lattice, Model, Mopr, Opr

# local operator matrices (reference conventions)
SP_HALF = {
    "Sz": np.array([0.5, -0.5]),
    "Sp": np.array([[0.0, 1.0], [0.0, 0.0]]),
    "Sm": np.array([[0.0, 0.0], [1.0, 0.0]]),
}
SP_ONE = {
    "Sz": np.array([1.0, 0.0, -1.0]),
    "Sp": np.sqrt(2.0) * np.array([[0, 1, 0], [0, 0, 1], [0, 0, 0.0]]),
    "Sm": np.sqrt(2.0) * np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]]),
}
# electron: |0>, |up>, |dn>, |up dn>  (reference: square_Fermi_Hubbard.cc:31-36)
C_UP = np.array([[0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1], [0, 0, 0, 0.0]])
C_DN = np.array([[0, 0, 1, 0], [0, 0, 0, -1], [0, 0, 0, 0], [0, 0, 0, 0.0]])
# tJ: |0>, |up>, |dn>
TJ_C_UP = np.array([[0, 1, 0], [0, 0, 0], [0, 0, 0.0]])
TJ_C_DN = np.array([[0, 0, 1], [0, 0, 0], [0, 0, 0.0]])
# spinless fermion: |0>, |1>
C_SPINLESS = np.array([[0.0, 1.0], [0.0, 0.0]])


def _heis_bond(m, i, j, ops, J=1.0):
    m.add_Ham(0.5 * J * (Opr(i, 0, False, ops["Sp"]) * Opr(j, 0, False, ops["Sm"])
                         + Opr(i, 0, False, ops["Sm"]) * Opr(j, 0, False, ops["Sp"])))
    m.add_Ham(J * (Opr(i, 0, False, ops["Sz"]) * Opr(j, 0, False, ops["Sz"])))


def _sz_total(L, ops, orbital=0):
    out = Mopr()
    for x in range(L):
        out += Opr(x, orbital, False, ops["Sz"])
    return out


def heisenberg_chain(L, spin="1/2"):
    """reference: examples/*/latt_chain/chain_Heisenberg_spin_{half,one}.cc"""
    ops = SP_HALF if spin == "1/2" else SP_ONE
    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(L, "spin-1/2" if spin == "1/2" else "spin-1")
    for x in range(L):
        _heis_bond(m, x, (x + 1) % L, ops)
    return m, {"Sz": _sz_total(L, ops)}


def kondo_chain(L, J_Kondo, t=1.0):
    """reference: examples/*/latt_chain/chain_Kondo.cc — electron orbital 0,
    local spin-1/2 orbital 1; Kondo exchange on-site."""
    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(L, "electron")
    m.add_orbital(L, "spin-1/2")
    N_tot, Sz_tot = Mopr(), Mopr()
    for x in range(L):
        j = (x + 1) % L
        cu_i, cd_i = Opr(x, 0, True, C_UP), Opr(x, 0, True, C_DN)
        cu_j, cd_j = Opr(j, 0, True, C_UP), Opr(j, 0, True, C_DN)
        n_up = cu_i.dagger() * cu_i
        n_dn = cd_i.dagger() * cd_i
        splus_i = cu_i.dagger() * cd_i
        sminus_i = cd_i.dagger() * cu_i
        sz_i = 0.5 * (cu_i.dagger() * cu_i) - 0.5 * (cd_i.dagger() * cd_i)
        Splus_i = Opr(x, 1, False, SP_HALF["Sp"])
        Sminus_i = Opr(x, 1, False, SP_HALF["Sm"])
        Sz_i = Opr(x, 1, False, SP_HALF["Sz"])
        m.add_Ham((-t) * (cu_i.dagger() * cu_j))
        m.add_Ham((-t) * (cu_j.dagger() * cu_i))
        m.add_Ham((-t) * (cd_i.dagger() * cd_j))
        m.add_Ham((-t) * (cd_j.dagger() * cd_i))
        m.add_Ham((0.5 * J_Kondo) * (Splus_i * sminus_i + Sminus_i * splus_i))
        m.add_Ham(J_Kondo * (Sz_i * sz_i))
        N_tot += n_up + n_dn
        Sz_tot += Sz_i + sz_i
    return m, {"N": N_tot, "Sz": Sz_tot}


def fermi_hubbard_square(Lx, Ly, t=1.0, U=1.1):
    """reference: examples/*/latt_square/square_Fermi_Hubbard.cc"""
    lat = Lattice("square", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "electron")
    Nup, Ndn = Mopr(), Mopr()
    for x in range(Lx):
        for y in range(Ly):
            i = lat.coor2site([x, y], 0)
            cu_i, cd_i = Opr(i, 0, True, C_UP), Opr(i, 0, True, C_DN)
            for dx, dy in ((1, 0), (0, 1)):
                j = lat.coor2site([x + dx, y + dy], 0)
                cu_j, cd_j = Opr(j, 0, True, C_UP), Opr(j, 0, True, C_DN)
                m.add_Ham((-t) * (cu_i.dagger() * cu_j))
                m.add_Ham((-t) * (cu_j.dagger() * cu_i))
                m.add_Ham((-t) * (cd_i.dagger() * cd_j))
                m.add_Ham((-t) * (cd_j.dagger() * cd_i))
            m.add_Ham(U * ((cu_i.dagger() * cu_i) * (cd_i.dagger() * cd_i)))
            Nup += cu_i.dagger() * cu_i
            Ndn += cd_i.dagger() * cd_i
    return m, {"Nup": Nup, "Ndn": Ndn}


def bose_hubbard_square(Lx, Ly, Nmax, t=1.0, U=1.1):
    """reference: examples/trans_absent/latt_square/square_Bose_Hubbard.cc"""
    b = np.zeros((Nmax + 1, Nmax + 1))
    for d in range(Nmax):
        b[d, d + 1] = np.sqrt(d + 1.0)
    lat = Lattice("square", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "boson", Nmax=Nmax)
    Nb = Mopr()
    for x in range(Lx):
        for y in range(Ly):
            i = lat.coor2site([x, y], 0)
            b_i = Opr(i, 0, False, b)
            n_i = b_i.dagger() * b_i
            for dx, dy in ((1, 0), (0, 1)):
                j = lat.coor2site([x + dx, y + dy], 0)
                b_j = Opr(j, 0, False, b)
                m.add_Ham((-t) * (b_i.dagger() * b_j))
                m.add_Ham((-t) * (b_j.dagger() * b_i))
            m.add_Ham((0.5 * U) * (n_i * n_i - n_i))
            Nb += n_i
    return m, {"N": Nb}


def spinless_fermion_honeycomb(Lx, Ly, t=1.0, V1=4.0):
    """reference: examples/*/latt_honeycomb/honeycomb_Spinless_Fermion.cc.
    Bonds from sublattice 0 of cell (x,y) to sublattice 1 of cells
    (x,y), (x-1,y), (x,y-1); interaction V1 (n_i-1/2)(n_j-1/2) expanded;
    the constant 0.25*V1 per bond is NOT added to H (matches reference:
    the golden E0 excludes it... it IS tracked separately there; the golden
    assertion applies to eigenvals which exclude `constant`)."""
    lat = Lattice("honeycomb", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spinless-fermion")
    Nf = Mopr()
    n_diag = np.array([0.0, 1.0])
    for x in range(Lx):
        for y in range(Ly):
            i = lat.coor2site([x, y], 0)
            c_i = Opr(i, 0, True, C_SPINLESS)
            n_i = Opr(i, 0, False, n_diag)
            for cx, cy in ((x, y), (x - 1, y), (x, y - 1)):
                j = lat.coor2site([cx, cy], 1)
                c_j = Opr(j, 0, True, C_SPINLESS)
                n_j = Opr(j, 0, False, n_diag)
                m.add_Ham((-t) * (c_i.dagger() * c_j))
                m.add_Ham((-t) * (c_j.dagger() * c_i))
                m.add_Ham(V1 * (n_i * n_j))
                m.add_Ham((-0.5 * V1) * n_i)
                m.add_Ham((-0.5 * V1) * n_j)
            Nf += n_i + Opr(lat.coor2site([x, y], 1), 0, False, n_diag)
    return m, {"N": Nf}


_KAGOME_BONDS = [
    # (sub_i, sub_j, cell displacement of j): reference kagome examples
    (0, 2, (1, 0)), (0, 2, (0, 0)),
    (1, 0, (0, 1)), (1, 0, (0, 0)),
    (2, 1, (-1, -1)), (2, 1, (0, 0)),
]


def kagome_heisenberg(Lx, Ly, J=1.0):
    """reference: examples/trans_absent/latt_kagome/kagome_Heisenberg_spin_half.cc"""
    lat = Lattice("kagome", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spin-1/2")
    for x in range(Lx):
        for y in range(Ly):
            for si, sj, (dx, dy) in _KAGOME_BONDS:
                i = lat.coor2site([x, y], si)
                j = lat.coor2site([x + dx, y + dy], sj)
                _heis_bond(m, i, j, SP_HALF, J)
    return m, {"Sz": _sz_total(lat.n_sites, SP_HALF)}


def kagome_tj(Lx, Ly, t=1.0, J=1.0):
    """reference: examples/*/latt_kagome/kagome_tJ.cc"""
    lat = Lattice("kagome", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "tJ")
    N_tot, Sz_tot = Mopr(), Mopr()

    def site_ops(s):
        cu, cd = Opr(s, 0, True, TJ_C_UP), Opr(s, 0, True, TJ_C_DN)
        return {
            "cu": cu, "cd": cd,
            "Sp": cu.dagger() * cd, "Sm": cd.dagger() * cu,
            "Sz": 0.5 * (cu.dagger() * cu) - 0.5 * (cd.dagger() * cd),
            "N": cu.dagger() * cu + cd.dagger() * cd,
        }

    for x in range(Lx):
        for y in range(Ly):
            for si, sj, (dx, dy) in _KAGOME_BONDS:
                i = lat.coor2site([x, y], si)
                j = lat.coor2site([x + dx, y + dy], sj)
                oi, oj = site_ops(i), site_ops(j)
                m.add_Ham((-t) * (oi["cu"].dagger() * oj["cu"]))
                m.add_Ham((-t) * (oj["cu"].dagger() * oi["cu"]))
                m.add_Ham((-t) * (oi["cd"].dagger() * oj["cd"]))
                m.add_Ham((-t) * (oj["cd"].dagger() * oi["cd"]))
                m.add_Ham((0.5 * J) * (oi["Sp"] * oj["Sm"] + oi["Sm"] * oj["Sp"]))
                m.add_Ham(J * (oi["Sz"] * oj["Sz"]))
                m.add_Ham((-0.25 * J) * (oi["N"] * oj["N"]))
    for s in range(lat.n_sites):
        o = site_ops(s)
        N_tot += o["N"]
        Sz_tot += o["Sz"]
    return m, {"N": N_tot, "Sz": Sz_tot}


def triangular_heisenberg(Lx, Ly, J1=1.0):
    """reference: examples/*/latt_triangular/triangular_Heisenberg_spin_half.cc.
    Bonds: (x,y)->(x+1,y), (x+1,y+1), (x,y+1)."""
    lat = Lattice("triangular", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spin-1/2")
    for x in range(Lx):
        for y in range(Ly):
            i = lat.coor2site([x, y], 0)
            for dx, dy in ((1, 0), (1, 1), (0, 1)):
                j = lat.coor2site([x + dx, y + dy], 0)
                _heis_bond(m, i, j, SP_HALF, J1)
    return m, {"Sz": _sz_total(lat.n_sites, SP_HALF)}
