"""projectQ_full / transform_vec_full (reference: src/model.cc:1550-1660)."""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu import Lattice, Model, Mopr, Opr
from quantum_basis_tpu.ops.operators import OprProd
from tests.models_zoo import C_SPINLESS, heisenberg_chain


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=n) + 1j * rng.normal(size=n)


def test_projector_idempotent_eigenvector_and_complete():
    L = 8
    m, cons = heisenberg_chain(L, "1/2")
    m.enumerate_basis_full([cons["Sz"]], [0.0])
    n = m.dim_full(0)
    x = _rand(n, 1)
    acc = np.zeros(n, dtype=np.complex128)
    for k in range(L):
        y = m.projectQ_full([k], 0, x)          # includes the self-check
        y2 = m.projectQ_full([k], 0, y)
        np.testing.assert_allclose(y2, y, atol=1e-10)  # idempotent
        acc += y
    np.testing.assert_allclose(acc, x, atol=1e-10)     # sum_k P_k = 1


def _spinless_chain(L, N):
    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(L, "spinless-fermion")
    Nf = Mopr()
    for x in range(L):
        c_i = Opr(x, 0, True, C_SPINLESS)
        c_j = Opr((x + 1) % L, 0, True, C_SPINLESS)
        m.add_Ham((-1.0) * (c_i.dagger() * c_j))
        m.add_Ham((-1.0) * (c_j.dagger() * c_i))
        Nf += c_i.dagger() * c_i
    m.enumerate_basis_full([Nf], [float(N)])
    return m


def test_transform_vec_fermionic_preserves_H_expectation():
    """<Ux|H|Ux> = <x|H|x> for a translation U of a translation-invariant
    fermionic H — exercises the permutation parity (src/basis.cc:694-704)."""
    import jax.numpy as jnp

    L, N = 6, 3
    m = _spinless_chain(L, N)
    s = m.sec_full[0]
    x = _rand(s.dim, 3)
    x /= np.linalg.norm(x)

    def h_exp(v):
        cv = (jnp.asarray(v.real.copy()), jnp.asarray(v.imag.copy()))
        yr, yi = s.matvec(cv)
        y = np.asarray(yr) + 1j * np.asarray(yi)
        return np.vdot(v, y)

    plan = m.lattice.translation_plan([2])
    ux = m.transform_vec_full(plan, 0, x)
    assert abs(np.linalg.norm(ux) - 1.0) < 1e-12
    assert abs(h_exp(ux) - h_exp(x)) < 1e-10


def test_projectQ_fermionic_eigenvector():
    """Momentum projection of fermionic states passes the internal
    unit-translation self-check (incl. antiperiodic-sector subtleties:
    states where the projector vanishes are fine)."""
    L, N = 6, 3
    m = _spinless_chain(L, N)
    n = m.dim_full(0)
    x = _rand(n, 7)
    acc = np.zeros(n, dtype=np.complex128)
    for k in range(L):
        y = m.projectQ_full([k], 0, x)
        acc += y
    np.testing.assert_allclose(acc, x, atol=1e-10)
