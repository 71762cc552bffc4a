"""Small components: Wavefunction, basis I/O, reflection, postprocess plots."""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu import Lattice, Mopr, Opr
from quantum_basis_tpu.basis.io import basis_load, basis_save
from quantum_basis_tpu.basis.wavefunction import Wavefunction
from quantum_basis_tpu.ops.operators import OprProd
from tests.models_zoo import SP_HALF, heisenberg_chain


def test_wavefunction_algebra_and_apply():
    m, _ = heisenberg_chain(6, "1/2")
    space = m.space
    w = Wavefunction.from_label(0, 1.0)  # all-up
    # apply S-_2: one image with amplitude 1
    Sm2 = Mopr([OprProd(1.0, [Opr(2, 0, False, SP_HALF["Sm"])])])
    w2 = w.apply(Sm2, space)
    assert w2.size == 1
    assert abs(w2.norm() - 1.0) < 1e-12
    # H|all-up> = (L/4)|all-up> for the Heisenberg chain
    hw = w.apply(m.Ham, space)
    assert hw.size == 1
    assert abs(hw.amps[0] - 6 / 4.0) < 1e-12
    # linear algebra: (w + w) has amplitude 2, inner products match
    s = w + w
    assert abs(s.inner(w) - 2.0) < 1e-12
    assert abs((0.5 * s).norm() - 1.0) < 1e-12
    # simplify drops cancelled amplitudes
    z = w + (-1.0) * w
    assert z.size == 0


def test_basis_io_roundtrip(tmp_path):
    labels = np.sort(np.random.default_rng(1).choice(
        1 << 40, 1000, replace=False)).astype(np.int64)
    p = str(tmp_path / "basis.bin")
    basis_save(p, labels)
    np.testing.assert_array_equal(basis_load(p), labels)


def test_reflection_plan_involution():
    lat = Lattice("chain", [8], ["pbc"])
    pl = lat.reflection_plan(0)
    assert np.array_equal(pl[pl], np.arange(8))


def test_postprocess_plots(tmp_path):
    from quantum_basis_tpu.postprocess import (plot_convergence, plot_lattice,
                                               plot_sqw, spectral_function)

    # single-pole continued fraction: norm 1, alpha = [2.0] -> peak at w = 2
    omegas = np.linspace(0, 4, 101)
    S = spectral_function(omegas, 1.0, np.asarray([2.0]), np.asarray([0.0]),
                          E0=0.0, eta=0.05)
    assert abs(omegas[np.argmax(S)] - 2.0) < 0.05
    out = str(tmp_path / "sqw.png")
    plot_sqw([0.25], [(1.0, np.asarray([2.0]), np.asarray([0.0]))],
             omegas, 0.0, out)
    assert np.fromfile(out, dtype=np.uint8).size > 0
    lat = Lattice("honeycomb", [2, 2], ["pbc", "pbc"])
    plot_lattice(lat, str(tmp_path / "latt.png"), bonds=[(0, 1)])
    plot_convergence([(1, 1e-2), (2, 1e-5), (3, 1e-9)],
                     str(tmp_path / "conv.png"))


def test_enumerate_dnc_matches_scan():
    """Divide-and-conquer combinatorial enumeration == chunked scan."""
    from quantum_basis_tpu.basis.enumerate import (enumerate_basis,
                                                   enumerate_basis_dnc)
    from models_zoo import heisenberg_chain, kagome_tj

    m, c = heisenberg_chain(14)
    a = enumerate_basis(m.space, [c["Sz"]], [1.0])
    b = enumerate_basis_dnc(m.space, [c["Sz"]], [1.0])
    np.testing.assert_array_equal(a, b)

    m, o = kagome_tj(2, 2)  # two conserved quantities, dim-3 sites, fermions
    a = enumerate_basis(m.space, [o["N"], o["Sz"]], [8.0, 0.0])
    b = enumerate_basis_dnc(m.space, [o["N"], o["Sz"]], [8.0, 0.0])
    np.testing.assert_array_equal(a, b)


def test_enumerate_dnc_huge_label_space():
    """3^31 label space (31-site t-J): O(sector) enumeration, exact count
    C(31,1)*C(30,1) for one up + one down electron."""
    from quantum_basis_tpu.basis.enumerate import enumerate_basis
    from quantum_basis_tpu.basis.site_basis import SiteBasis
    from quantum_basis_tpu.basis.state import StateSpace
    from quantum_basis_tpu import Mopr, Opr

    cu_m = np.array([[0, 1, 0], [0, 0, 0], [0, 0, 0.0]])
    cd_m = np.array([[0, 0, 1], [0, 0, 0], [0, 0, 0.0]])
    space = StateSpace([(SiteBasis.named("tJ"), 31)])
    N_tot, Sz_tot = Mopr(), Mopr()
    for s in range(31):
        cu, cd = Opr(s, 0, True, cu_m), Opr(s, 0, True, cd_m)
        N_tot += cu.dagger() * cu + cd.dagger() * cd
        Sz_tot += 0.5 * (cu.dagger() * cu) - 0.5 * (cd.dagger() * cd)
    lab = enumerate_basis(space, [N_tot, Sz_tot], [2.0, 0.0])
    assert lab.size == 31 * 30
    assert lab.dtype == np.int64 and np.all(np.diff(lab) > 0)  # sorted unique


def test_enumerate_dnc_nonseparable_falls_back():
    """A two-site diagonal conserved op is not separable: dnc returns None
    and enumerate_basis falls back to the scan (small space here)."""
    from quantum_basis_tpu.basis.enumerate import (enumerate_basis,
                                                   enumerate_basis_dnc)
    from models_zoo import SP_HALF, heisenberg_chain
    from quantum_basis_tpu import Mopr, Opr

    m, c = heisenberg_chain(8)
    zz = Mopr()
    for x in range(8):
        zz += Opr(x, 0, False, SP_HALF["Sz"]) * Opr((x + 1) % 8, 0, False,
                                                    SP_HALF["Sz"])
    assert enumerate_basis_dnc(m.space, [zz], [2.0]) is None
    lab = enumerate_basis(m.space, [zz], [2.0])
    assert lab.size == 2  # all-up and all-down (each: sum SzSz = 8/4)


def test_enumerate_dnc_nondiagonal_falls_back():
    """A non-diagonal single-site conserved operator must NOT be silently
    diagonal-projected by the dnc path (the scan path's compile_diagonal
    raises for it) — dnc returns None instead (advisor round-2 finding)."""
    import numpy as np

    from quantum_basis_tpu import Mopr, Opr
    from quantum_basis_tpu.basis.enumerate import enumerate_basis_dnc
    from models_zoo import heisenberg_chain

    m, _ = heisenberg_chain(8)
    sx = Mopr()
    for x in range(8):
        sx += Opr(x, 0, False, np.array([[0.0, 0.5], [0.5, 0.0]]))
    assert enumerate_basis_dnc(m.space, [sx], [0.0]) is None
