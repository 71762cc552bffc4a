"""Tilted-supercell clusters: TOML parsing, group structure, spectra."""

import numpy as np
import pytest

from quantum_basis_tpu import Model, Mopr, Opr
from quantum_basis_tpu.lattice.tilted import TiltedLattice

from models_zoo import SP_HALF, _heis_bond, _sz_total

REF_TOML = "/root/reference/latt_special/triangular_31site.toml"


def _tilted_square_5():
    """5-site tilted square cluster: A = [[2,1],[-1,2]] (|det| = 5).

    Coset representatives of Z^2 / A Z^2 found by scanning a box and keeping
    coordinates with distinct folded values."""
    A = np.asarray([[2, 1], [-1, 2]])
    Ainv = np.linalg.inv(A.astype(float))
    seen, sites = set(), []
    for x in range(-2, 3):
        for y in range(-2, 3):
            alpha = np.asarray([x, y]) @ Ainv
            M = np.floor(alpha + 1e-12).astype(int)
            c0 = tuple(np.asarray([x, y]) - M @ A)
            if c0 not in seen:
                seen.add(c0)
                sites.append(([x, y], 0))
            if len(sites) == 5:
                return TiltedLattice(2, 1, np.eye(2), A, [[0.0, 0.0]], sites)
    raise AssertionError("failed to enumerate cosets")


def test_toml_parse_reference_cluster():
    lat = TiltedLattice.from_toml(REF_TOML)
    assert lat.Nsites == 31 and lat.num_sub == 1 and lat.dim == 2
    disps, plans = lat.translation_group()
    assert disps.shape[0] == 31
    # every plan is a permutation; the group is closed
    for p in plans:
        assert sorted(p.tolist()) == list(range(31))
    # identity is present exactly once
    ident = sum(1 for p in plans if np.array_equal(p, np.arange(31)))
    assert ident == 1


def test_tilted_square_group_structure():
    lat = _tilted_square_5()
    assert lat.Nsites == 5
    disps, plans = lat.translation_group()
    assert len(disps) == 5
    # closure: composing any two plans gives another group element
    keyset = {tuple(p.tolist()) for p in plans}
    for p1 in plans:
        for p2 in plans:
            assert tuple(lat.plan_product(p2, p1).tolist()) in keyset


def _heisenberg_on(lat, bonds):
    m = Model(lat)
    m.add_orbital(lat.n_sites, "spin-1/2")
    for i, j in bonds:
        _heis_bond(m, i, j, SP_HALF)
    return m


def _tilted_square_bonds(lat):
    bonds = set()
    for s in range(lat.n_sites):
        coor, sub = lat.site2coor(s)
        for d in ((1, 0), (0, 1)):
            j = lat.coor2site([coor[0] + d[0], coor[1] + d[1]], sub)
            bonds.add((min(s, j), max(s, j)))
    return sorted(bonds)


def test_tilted_momentum_sectors_complete_and_match_full():
    """Sum of k-sector dims = sector dim; best E0(k) = full E0 (dense)."""
    lat = _tilted_square_5()
    bonds = _tilted_square_bonds(lat)
    assert len(bonds) == 10  # 5 sites x 4 neighbors / 2
    m = _heisenberg_on(lat, bonds)
    Sz = _sz_total(5, SP_HALF)
    dim_full = m.enumerate_basis_full([Sz], [0.5])  # 5 spins: Sz = 1/2 sector
    m.locate_E0_lanczos("full")
    E0_full = m.eigenvals_full[0]

    dims = 0
    E0s = []
    for k0 in range(5):
        # momenta live on the superlattice reciprocal: integer labels via
        # the first reciprocal direction only (group is cyclic of order 5)
        try:
            d = m.enumerate_basis_repr([k0, 0], [Sz], [0.5], sec=1)
        except ValueError:
            continue
        dims += d
        m.locate_E0_lanczos("repr", nev=1, sec=1)
        E0s.append(m.eigenvals_repr[0])
    assert dims == dim_full
    assert abs(min(E0s) - E0_full) < 1e-9


@pytest.mark.slow
def test_triangular_31site_heisenberg_smoke():
    """31-site cluster from the reference TOML: enumerate a small sector and
    check sector-dimension completeness over a few momenta."""
    lat = TiltedLattice.from_toml(REF_TOML)
    bonds = set()
    for s in range(lat.n_sites):
        coor, _ = lat.site2coor(s)
        for d in ((1, 0), (0, 1), (1, 1)):
            j = lat.coor2site([coor[0] + d[0], coor[1] + d[1]], 0)
            bonds.add((min(s, j), max(s, j)))
    assert len(bonds) == 3 * 31  # triangular coordination 6
    m = _heisenberg_on(lat, sorted(bonds))
    Sz = _sz_total(31, SP_HALF)
    # deep sector to keep dims manageable: Sz = 27/2 (two down spins)
    dim_full = m.enumerate_basis_full([Sz], [13.5])
    assert dim_full == 31 * 30 // 2  # C(31, 2)
    total = 0
    for k0 in range(31):
        ktuple = [k0, 0]
        try:
            total += m.enumerate_basis_repr(ktuple, [Sz], [13.5], sec=1)
        except ValueError:
            continue
    assert total == dim_full