"""Roll/transpose translations + momentum-filtered full-space solves.

Pins ops/translate_fullspace.py to three oracles:
1. the permutation oracle (space.transform over lattice translation plans),
   including fermionic boundary signs;
2. projector algebra: P_k idempotent, sum_k P_k = 1 (resolution of identity);
3. the existing gather-based repr path: E0(k) equal at solver tolerance on
   the golden chain and a 2-d multi-sublattice lattice.
"""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu.basis.state import StateSpace
from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.lattice import Lattice
from quantum_basis_tpu.ops.translate_fullspace import (MomentumProjector,
                                                       RollTranslations)

SZ = np.array([0.5, -0.5])
SP = np.array([[0.0, 1.0], [0.0, 0.0]])
SM = SP.T.copy()


def _space(lattice, kind="spin-1/2"):
    return StateSpace([(SiteBasis.named(kind), lattice.Nsites)])


def _rand_dense(N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=N)


@pytest.mark.parametrize("latt_args,kind", [
    (("chain", [6], ["pbc"]), "spin-1/2"),
    (("chain", [6], ["pbc"]), "spinless-fermion"),
    (("square", [2, 3], ["pbc", "pbc"]), "spin-1/2"),
    (("kagome", [2, 2], ["pbc", "pbc"]), "spin-1/2"),
    (("honeycomb", [3, 2], ["pbc", "pbc"]), "spinless-fermion"),
    (("triangular", [2, 2], ["pbc", "pbc"]), "tJ"),
])
def test_translate_matches_permutation_oracle(latt_args, kind):
    lat = Lattice(*latt_args)
    space = _space(lat, kind)
    rolls = RollTranslations(space, lat)  # constructor self-checks unit shifts
    # composite displacements against the oracle
    rng = np.random.default_rng(3)
    x = _rand_dense(space.label_space, 1)
    disps, plans = lat.translation_group()
    for g in rng.choice(len(disps), size=min(4, len(disps)), replace=False):
        plan = plans[g]
        labels = np.arange(space.label_space, dtype=np.int64)
        new_labels, parity = space.transform(labels, plan)
        y_oracle = np.zeros_like(x)
        y_oracle[new_labels] = x * np.where(parity % 2 == 0, 1.0, -1.0)
        xin = x
        # fold per-dim signs in application order (last dim applied first
        # must match translate_disp's loop order: dims ascending)
        y = xin
        for d in range(lat.dim):
            r = int(disps[g][d]) % int(lat.L[d])
            if not r:
                continue
            sg = rolls.sign_host(d, r)
            y = rolls.translate(y * sg if sg is not None else y, d, r)
        assert np.allclose(y, y_oracle), (latt_args, kind, disps[g])


def test_kondo_two_orbitals():
    """Multi-orbital blocks (electron x localized spin) translate correctly."""
    lat = Lattice("chain", [4], ["pbc"])
    space = StateSpace([(SiteBasis.named("electron"), 4),
                        (SiteBasis.named("spin-1/2"), 4)])
    rolls = RollTranslations(space, lat)
    x = _rand_dense(space.label_space, 2)
    plan = lat.translation_plan([1])
    labels = np.arange(space.label_space, dtype=np.int64)
    new_labels, parity = space.transform(labels, plan)
    y_oracle = np.zeros_like(x)
    y_oracle[new_labels] = x * np.where(parity % 2 == 0, 1.0, -1.0)
    sg = rolls.sign_host(0, 1)
    y = rolls.translate(x * sg if sg is not None else x, 0, 1)
    assert np.allclose(y, y_oracle)


@pytest.mark.parametrize("latt_args,kind,k", [
    (("chain", [6], ["pbc"]), "spin-1/2", [1]),
    (("chain", [6], ["pbc"]), "spinless-fermion", [2]),
    (("square", [2, 3], ["pbc", "pbc"]), "spin-1/2", [1, 2]),
])
def test_projector_algebra(latt_args, kind, k):
    lat = Lattice(*latt_args)
    space = _space(lat, kind)
    rolls = RollTranslations(space, lat)
    N = space.label_space
    x = _rand_dense(N, 5)
    proj = MomentumProjector(rolls, k)
    re, im = proj.apply_host(x, None)
    re2, im2 = proj.apply_host(re, im)
    assert np.allclose(re2, re, atol=1e-12)
    if im is not None:
        assert np.allclose(im2, im, atol=1e-12)
    # resolution of identity: sum over all momenta recovers x
    ranges = [range(int(lat.L[d])) if lat.bc[d] == "pbc" else range(1)
              for d in range(lat.dim)]
    import itertools

    tot_re = np.zeros(N)
    tot_im = np.zeros(N)
    for kk in itertools.product(*ranges):
        r, i = MomentumProjector(rolls, list(kk)).apply_host(x, None)
        tot_re += r
        tot_im += i if i is not None else 0.0
    assert np.allclose(tot_re, x, atol=1e-10)
    assert np.allclose(tot_im, 0.0, atol=1e-10)


def test_projector_matches_dense_projector_oracle():
    """P_k from rolls == (1/G) sum_R e^{+ik.R} T(R) built densely."""
    lat = Lattice("chain", [4], ["pbc"])
    space = _space(lat, "spinless-fermion")
    rolls = RollTranslations(space, lat)
    N = space.label_space
    disps, plans = lat.translation_group()
    for k in range(4):
        P = np.zeros((N, N), dtype=np.complex128)
        for g in range(len(disps)):
            labels = np.arange(N, dtype=np.int64)
            new_labels, parity = space.transform(labels, plans[g])
            ph = np.exp(2j * np.pi * k * disps[g][0] / 4)
            for a in range(N):
                P[new_labels[a], a] += ph * (-1.0) ** parity[a] / len(disps)
        x = _rand_dense(N, 7)
        want = P @ x
        re, im = MomentumProjector(rolls, [k]).apply_host(x, None)
        got = re + 1j * (im if im is not None else 0.0)
        assert np.allclose(got, want, atol=1e-12), k


def _build_heisenberg(L):
    from quantum_basis_tpu.models import Model
    from quantum_basis_tpu.ops.operators import Mopr, Opr

    lat = Lattice("chain", [L], ["pbc"])
    m = Model(lat)
    m.add_orbital(L, "spin-1/2")
    Sz_tot = Mopr()
    for x in range(L):
        j = (x + 1) % L
        m.add_Ham(0.5 * (Opr(x, 0, False, SP) * Opr(j, 0, False, SM)
                         + Opr(x, 0, False, SM) * Opr(j, 0, False, SP)))
        m.add_Ham(Opr(x, 0, False, SZ) * Opr(j, 0, False, SZ))
        Sz_tot += Opr(x, 0, False, SZ)
    return m, Sz_tot


@pytest.mark.parametrize("k", [0, 1, 3])
def test_e0k_matches_ell_repr_path(k):
    """Momentum-filtered full-space solve == gather ELL repr solve, and the
    extracted repr eigenvector agrees up to a global phase."""
    L = 14
    m, Sz = _build_heisenberg(L)
    m.enumerate_basis_repr([k], [Sz], [0.0])
    sector = m.sec_repr[0]
    assert sector.dim > 60

    fs = m._fullspace_repr_op(sector)
    assert fs is not None

    from quantum_basis_tpu.solvers.restarted import eigs_smallest

    evals_fs, vecs_fs = eigs_smallest(fs, fs.N, nev=1, ncv=12, maxit=400,
                                      complex_vec=fs.is_complex)
    evals_ell, vecs_ell = eigs_smallest(m._repr_ell(sector), sector.dim,
                                        nev=1, ncv=12, maxit=400,
                                        complex_vec=True)
    assert abs(evals_fs[0] - evals_ell[0]) < 1e-9

    cr, ci = sector.dbasis.from_full(vecs_fs[0])
    a = np.asarray(cr) + 1j * (np.asarray(ci) if ci is not None else 0.0)
    b = np.asarray(vecs_ell[0][0]) + 1j * np.asarray(vecs_ell[0][1])
    ov = abs(np.vdot(a, b))
    assert ov > 1.0 - 1e-8, ov


def test_model_repr_solve_routes_fullspace():
    """End-to-end: Model.locate_E0_lanczos(which='repr') uses the projected
    full-space path and reproduces the L=16 golden E0(k) values."""
    golden = {0: -7.142296361, 1: -6.523407057, 2: -5.990986863}
    L = 16
    for k, want in golden.items():
        m, Sz = _build_heisenberg(L)
        m.enumerate_basis_repr([k], [Sz], [0.0])
        sector = m.sec_repr[0]
        assert m._fullspace_repr_op(sector) is not None
        m.locate_E0_lanczos(which="repr")
        assert abs(m.eigenvals_repr[0] - want) < 1e-8, (k, m.eigenvals_repr)
