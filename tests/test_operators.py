"""Operator algebra + term compilation vs independent Kronecker/JW oracle."""

import numpy as np

from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace
from quantum_basis_tpu.ops.compile import compile_operator
from quantum_basis_tpu.ops.dense import dense_matrix
from quantum_basis_tpu.ops.operators import Mopr, Opr

from oracles import ELECTRON, SP_HALF, TJ, mopr_dense


def _full_labels(space):
    return np.arange(space.label_space, dtype=np.int64)


def compare(space, mopr, atol=1e-12):
    compiled = compile_operator(mopr, space)
    got = dense_matrix(compiled, _full_labels(space))
    want = mopr_dense(space, mopr)
    np.testing.assert_allclose(got, want, atol=atol)


def heisenberg_bond(i, j, J=1.0):
    Sp_i, Sm_i = Opr(i, 0, False, SP_HALF["Sp"]), Opr(i, 0, False, SP_HALF["Sm"])
    Sz_i = Opr(i, 0, False, SP_HALF["Sz"])
    Sp_j, Sm_j = Opr(j, 0, False, SP_HALF["Sp"]), Opr(j, 0, False, SP_HALF["Sm"])
    Sz_j = Opr(j, 0, False, SP_HALF["Sz"])
    return 0.5 * J * (Sp_i * Sm_j + Sm_i * Sp_j) + J * (Sz_i * Sz_j)


def test_opr_algebra_basics():
    Sp = Opr(0, 0, False, SP_HALF["Sp"])
    Sm = Opr(0, 0, False, SP_HALF["Sm"])
    # S+ S- merges on the same slot into a single diagonal factor
    prod = Sp * Sm
    assert len(prod.factors) == 1
    np.testing.assert_allclose(prod.factors[0].dense(), np.diag([1.0, 0.0]))
    # dagger of S+ is S-
    assert np.allclose(Sp.dagger().dense(), Sm.dense())


def test_fermion_anticommutation_sign():
    """c_i c_j = -c_j c_i for i != j must be encoded by canonicalization."""
    c0 = Opr(0, 0, True, TJ["c_up"])
    c1 = Opr(1, 0, True, TJ["c_up"])
    p_a = c0 * c1  # Mopr
    p_b = c1 * c0
    sp = StateSpace([(SiteBasis.named("tJ"), 2)])
    A = mopr_dense(sp, p_a if isinstance(p_a, Mopr) else Mopr([p_a]))
    B = mopr_dense(sp, p_b if isinstance(p_b, Mopr) else Mopr([p_b]))
    np.testing.assert_allclose(A, -B, atol=1e-14)
    # and the compiled path agrees with the oracle for both orders
    compare(sp, p_a if isinstance(p_a, Mopr) else Mopr([p_a]))
    compare(sp, p_b if isinstance(p_b, Mopr) else Mopr([p_b]))


def test_heisenberg_chain_dense():
    L = 4
    sp = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    H = Mopr()
    for x in range(L):
        H += heisenberg_bond(x, (x + 1) % L)
    assert H.q_hermitian()
    compare(sp, H)


def test_tj_chain_dense_with_hopping():
    """t-J chain: fermionic hopping with JW strings incl. wrap-around bond."""
    L = 4
    sp = StateSpace([(SiteBasis.named("tJ"), L)])
    H = Mopr()
    for m in range(L):
        j = (m + 1) % L
        cu_i = Opr(m, 0, True, TJ["c_up"])
        cd_i = Opr(m, 0, True, TJ["c_dn"])
        cu_j = Opr(j, 0, True, TJ["c_up"])
        cd_j = Opr(j, 0, True, TJ["c_dn"])
        H += (-1.0) * (cu_i.dagger() * cu_j)
        H += (-1.0) * (cu_j.dagger() * cu_i)
        H += (-1.0) * (cd_i.dagger() * cd_j)
        H += (-1.0) * (cd_j.dagger() * cd_i)
    assert H.q_hermitian()
    compare(sp, H)


def test_electron_hubbard_dense():
    L = 3
    sp = StateSpace([(SiteBasis.named("electron"), L)])
    H = Mopr()
    U = 1.3
    for m in range(L):
        j = (m + 1) % L
        cu_i = Opr(m, 0, True, ELECTRON["c_up"])
        cd_i = Opr(m, 0, True, ELECTRON["c_dn"])
        cu_j = Opr(j, 0, True, ELECTRON["c_up"])
        cd_j = Opr(j, 0, True, ELECTRON["c_dn"])
        H += (-1.0) * (cu_i.dagger() * cu_j) + (-1.0) * (cu_j.dagger() * cu_i)
        H += (-1.0) * (cd_i.dagger() * cd_j) + (-1.0) * (cd_j.dagger() * cd_i)
        n_up = cu_i.dagger() * cu_i
        n_dn = cd_i.dagger() * cd_i
        H += U * (n_up * n_dn)
    assert H.q_hermitian()
    compare(sp, H)


def test_kondo_two_orbitals():
    """electron orbital 0 + localized spin orbital 1: J S.s coupling."""
    L = 2
    sp = StateSpace([
        (SiteBasis.named("electron"), L),
        (SiteBasis.named("spin-1/2"), L),
    ])
    H = Mopr()
    for m in range(L):
        j = (m + 1) % L
        cu_i = Opr(m, 0, True, ELECTRON["c_up"])
        cd_i = Opr(m, 0, True, ELECTRON["c_dn"])
        cu_j = Opr(j, 0, True, ELECTRON["c_up"])
        cd_j = Opr(j, 0, True, ELECTRON["c_dn"])
        if m == 0 or L > 2:  # avoid double-counting the L=2 bond
            H += (-1.0) * (cu_i.dagger() * cu_j) + (-1.0) * (cu_j.dagger() * cu_i)
            H += (-1.0) * (cd_i.dagger() * cd_j) + (-1.0) * (cd_j.dagger() * cd_i)
        # Kondo coupling on site m: S_loc . s_el
        sz_el = 0.5 * (cu_i.dagger() * cu_i) - 0.5 * (cd_i.dagger() * cd_i)
        sp_el = cu_i.dagger() * cd_i
        sm_el = cd_i.dagger() * cu_i
        Sz = Opr(m, 1, False, SP_HALF["Sz"])
        Sp = Opr(m, 1, False, SP_HALF["Sp"])
        Sm = Opr(m, 1, False, SP_HALF["Sm"])
        H += 1.7 * (Sz * sz_el) + 0.85 * (Sp * sm_el + Sm * sp_el)
    assert H.q_hermitian()
    compare(sp, H)


def test_dagger_reverses_products():
    c0 = Opr(0, 0, True, TJ["c_up"])
    c1 = Opr(1, 0, True, TJ["c_dn"])
    prod = c0.dagger() * c1
    sp = StateSpace([(SiteBasis.named("tJ"), 2)])
    A = mopr_dense(sp, prod)
    Ad = mopr_dense(sp, prod.dagger())
    np.testing.assert_allclose(Ad, A.conj().T, atol=1e-14)


def test_transform_relabels_sites():
    sp = StateSpace([(SiteBasis.named("spin-1/2"), 3)])
    bond01 = heisenberg_bond(0, 1)
    plan = np.array([1, 2, 0])  # site i -> i+1
    moved = bond01.transform(plan)
    np.testing.assert_allclose(
        mopr_dense(sp, moved), mopr_dense(sp, heisenberg_bond(1, 2)), atol=1e-14
    )
