"""Spinless fermions with nearest-neighbor repulsion on the honeycomb
lattice (3x2 cells, 6+6 sites).

Python driver mirroring the reference examples
examples/trans_absent/latt_honeycomb/honeycomb_Spinless_Fermion.cc
(full sector E0 at N=4) and the trans_symmetric variant (all 6 momentum
sectors). Interaction V1 (n_i - 1/2)(n_j - 1/2) expanded; the constant
V1/4 per bond is excluded from the eigenvalues, as in the reference.

Run:  python examples/honeycomb_spinless_fermion.py
"""

from __future__ import annotations

import os
import sys

try:
    import quantum_basis_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quantum_basis_tpu import Lattice, Model, Mopr, Opr

C = np.array([[0.0, 1.0], [0.0, 0.0]])
N_DIAG = np.array([0.0, 1.0])


def build(Lx, Ly, t=1.0, V1=4.0):
    lat = Lattice("honeycomb", [Lx, Ly], ["pbc", "pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spinless-fermion")
    N_tot = Mopr()
    for x in range(Lx):
        for y in range(Ly):
            i = lat.coor2site([x, y], 0)
            c_i, n_i = Opr(i, 0, True, C), Opr(i, 0, False, N_DIAG)
            for cx, cy in ((x, y), (x - 1, y), (x, y - 1)):
                j = lat.coor2site([cx, cy], 1)
                c_j, n_j = Opr(j, 0, True, C), Opr(j, 0, False, N_DIAG)
                m.add_Ham((-t) * (c_i.dagger() * c_j))
                m.add_Ham((-t) * (c_j.dagger() * c_i))
                m.add_Ham(V1 * (n_i * n_j))
                m.add_Ham((-0.5 * V1) * n_i)
                m.add_Ham((-0.5 * V1) * n_j)
            N_tot += n_i + Opr(lat.coor2site([x, y], 1), 0, False, N_DIAG)
    return m, N_tot


def main():
    # full sector (trans_absent honeycomb_Spinless_Fermion.cc:129)
    m, N = build(3, 2)
    dim = m.enumerate_basis_full([N], [4.0])
    print(f"3x2 honeycomb N=4 sector dim = {dim}")
    m.locate_E0_lanczos(nev=1, ncv=1)
    E0 = m.eigenvals_full[0]
    print(f"E0(full) = {E0:.9f}")
    assert abs(E0 - (-28.60363167)) < 1e-8

    # momentum sectors (trans_symmetric …cc:136-141)
    mk, Nk = build(3, 2)
    for kx in range(3):
        for ky in range(2):
            mk.enumerate_basis_repr([kx, ky], [Nk], [4.0])
            mk.locate_E0_lanczos(which="repr")
            e0k = mk.eigenvals_repr[0]
            e_ref = -28.60363167 if ky == 0 else -28.27163215
            print(f"E0(k=({kx},{ky})) = {e0k:.9f}")
            assert abs(e0k - e_ref) < 1e-8, ((kx, ky), e0k)
    print("All checks passed.")


if __name__ == "__main__":
    main()
