"""Tests for StateSpace label codec, transforms, and fermionic signs."""

import numpy as np

from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace


def space_spin(L):
    return StateSpace([(SiteBasis.named("spin-1/2"), L)])


def space_tj(L):
    return StateSpace([(SiteBasis.named("tJ"), L)])


def test_slots_orbital_major():
    # Kondo-style: electron orbital + spin orbital on 3 sites
    sp = StateSpace([
        (SiteBasis.named("electron"), 3),
        (SiteBasis.named("spin-1/2"), 3),
    ])
    assert sp.n_slots == 6
    assert sp.slot(0, 0) == 0 and sp.slot(2, 0) == 2
    assert sp.slot(0, 1) == 3 and sp.slot(2, 1) == 5
    assert sp.dims.tolist() == [4, 4, 4, 2, 2, 2]
    assert sp.label_space == 4**3 * 2**3


def test_encode_decode_roundtrip():
    sp = space_tj(5)
    labels = np.arange(sp.label_space, dtype=np.int64)
    V = sp.decode(labels)
    back = sp.encode(V)
    np.testing.assert_array_equal(back, labels)


def test_transform_bosonic_translation():
    sp = space_spin(4)
    # shift by +1 with pbc: plan[i] = (i+1) % 4
    plan = (np.arange(4) + 1) % 4
    labels = np.arange(16, dtype=np.int64)
    new, parity = sp.transform(labels, plan)
    assert np.all(parity == 0)
    V = sp.decode(labels)
    Vn = sp.decode(new)
    # value of site i moved to site plan[i]
    for i in range(4):
        np.testing.assert_array_equal(Vn[:, plan[i]], V[:, i])


def test_transform_fermion_sign_two_particles():
    # spinless fermions on 3 sites; state |110> (sites 0,1 occupied)
    sp = StateSpace([(SiteBasis.named("spinless-fermion"), 3)])
    lab = sp.encode(np.array([1, 1, 0], dtype=np.int64))
    # cyclic shift +1: occupied sites 0,1 -> 1,2 : c0†c1† -> c1†c2†, even # of
    # crossings (no fermion wraps) => sign +1
    new, parity = sp.transform(np.array([lab]), (np.arange(3) + 1) % 3)
    assert parity[0] == 0
    # shift again: 1,2 -> 2,0 : c2†c0† = -c0†c2† => odd parity
    new2, parity2 = sp.transform(new, (np.arange(3) + 1) % 3)
    assert parity2[0] == 1
    V = sp.decode(new2)
    np.testing.assert_array_equal(V[0], [1, 0, 1])


def test_transform_parity_matches_bubble_sort():
    """Cross-check the quadratic-form parity against explicit bubble sort of
    the occupied-mode list (the reference's method, src/basis.cc:598-609)."""
    rng = np.random.default_rng(0)
    sp = StateSpace([(SiteBasis.named("tJ"), 6)])
    F = sp.fermion_count_table
    for trial in range(50):
        plan = rng.permutation(6)
        labels = rng.integers(0, sp.label_space, size=20, dtype=np.int64)
        new, parity = sp.transform(labels, plan)
        V = sp.decode(labels)
        for i in range(20):
            # explicit: list fermion modes in slot order with multiplicity,
            # relabel by plan, count inversions
            modes = []
            for s in range(6):
                modes += [plan[s]] * int(F[s, V[i, s]])
            inv = sum(
                1
                for x in range(len(modes))
                for y in range(x + 1, len(modes))
                if modes[x] > modes[y]
            )
            assert parity[i] == inv % 2, (trial, i)


def test_statistics():
    sp = space_tj(4)
    lab = sp.encode(np.array([[0, 1, 2, 1]], dtype=np.int64))
    st = sp.statistics(lab)
    assert st[0].tolist() == [1, 2, 1]
