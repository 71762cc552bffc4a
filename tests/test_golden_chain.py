"""Golden-value regression: the reference's self-test workloads.

Reproduces src/main_test.cc end-to-end through the Model API:
- 16-site spin-1/2 Heisenberg chain: E0 and three correlators (1e-8);
- 12-site t-J chain, N=8, Sz=0, degenerate E0=E1 via thick-restart (IRAM).
"""

import numpy as np
import pytest

from quantum_basis_tpu import Lattice, Model, Mopr, Opr

from oracles import SP_HALF, TJ


def build_heisenberg_chain(L=16, J=1.0):
    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spin-1/2")
    for x in range(L):
        i = lat.coor2site([x], 0)
        j = lat.coor2site([x + 1], 0)
        Sp_i, Sm_i = Opr(i, 0, False, SP_HALF["Sp"]), Opr(i, 0, False, SP_HALF["Sm"])
        Sz_i = Opr(i, 0, False, SP_HALF["Sz"])
        Sp_j, Sm_j = Opr(j, 0, False, SP_HALF["Sp"]), Opr(j, 0, False, SP_HALF["Sm"])
        Sz_j = Opr(j, 0, False, SP_HALF["Sz"])
        m.add_Ham(0.5 * J * (Sp_i * Sm_j + Sm_i * Sp_j))
        m.add_Ham(J * (Sz_i * Sz_j))
    return m


@pytest.mark.slow
def test_heisenberg_chain_16_golden():
    m = build_heisenberg_chain(16)
    dim = m.enumerate_basis_full([], [])
    assert dim == 65536
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    assert abs(m.eigenvals_full[0] + 7.142296361) < 1e-8

    Sz0Sz1 = Opr(0, 0, False, SP_HALF["Sz"]) * Opr(1, 0, False, SP_HALF["Sz"])
    Sz0Sz2 = Opr(0, 0, False, SP_HALF["Sz"]) * Opr(2, 0, False, SP_HALF["Sz"])
    Sp0Sm1 = Opr(0, 0, False, SP_HALF["Sp"]) * Opr(1, 0, False, SP_HALF["Sm"])
    m1 = m.measure_full_static(Sz0Sz1, 0, 0)
    m2 = m.measure_full_static(Sz0Sz2, 0, 0)
    m3 = m.measure_full_static(Sp0Sm1, 0, 0)
    assert abs(m1.real + 0.1487978408) < 1e-8
    assert abs(m2.real - 0.0617414604) < 1e-8
    assert abs(m3.real + 0.2975956817) < 1e-8


def build_tj_chain(L=12, t=1.0, J=1.0):
    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(lat.n_sites, "tJ")
    Sz_total, N_total = Mopr(), Mopr()
    for x in range(L):
        i = lat.coor2site([x], 0)
        j = lat.coor2site([x + 1], 0)
        cu_i, cd_i = Opr(i, 0, True, TJ["c_up"]), Opr(i, 0, True, TJ["c_dn"])
        cu_j, cd_j = Opr(j, 0, True, TJ["c_up"]), Opr(j, 0, True, TJ["c_dn"])
        Sp_i, Sm_i = cu_i.dagger() * cd_i, cd_i.dagger() * cu_i
        Sz_i = 0.5 * (cu_i.dagger() * cu_i) - 0.5 * (cd_i.dagger() * cd_i)
        N_i = cu_i.dagger() * cu_i + cd_i.dagger() * cd_i
        Sp_j, Sm_j = cu_j.dagger() * cd_j, cd_j.dagger() * cu_j
        Sz_j = 0.5 * (cu_j.dagger() * cu_j) - 0.5 * (cd_j.dagger() * cd_j)
        N_j = cu_j.dagger() * cu_j + cd_j.dagger() * cd_j
        m.add_Ham((-t) * (cu_i.dagger() * cu_j))
        m.add_Ham((-t) * (cu_j.dagger() * cu_i))
        m.add_Ham((-t) * (cd_i.dagger() * cd_j))
        m.add_Ham((-t) * (cd_j.dagger() * cd_i))
        m.add_Ham(0.5 * J * (Sp_i * Sm_j + Sm_i * Sp_j))
        m.add_Ham(J * (Sz_i * Sz_j))
        m.add_Ham((-0.25 * J) * (N_i * N_j))
        Sz_total += Sz_i
        N_total += N_i
    return m, Sz_total, N_total


@pytest.mark.slow
def test_tj_chain_12_golden_degenerate():
    m, Sz_total, N_total = build_tj_chain(12)
    dim = m.enumerate_basis_full([Sz_total, N_total], [0.0, 8.0])
    assert dim == 34650  # C(12,8) * C(8,4)
    m.locate_E0_iram("full", nev=4, ncv=12)
    assert abs(m.eigenvals_full[0] + 9.762087307) < 1e-8
    assert abs(m.eigenvals_full[1] + 9.762087307) < 1e-8
