"""Variational (Trugman) basis sector: growth, matrix, measurements.

The reference ships no vrnl example drivers, so correctness is pinned by
(a) analytic one-magnon dispersion on a ferromagnetic background,
(b) an independent brute-force numpy oracle replicating the reference's
    translate-to-center semantics (src/basis.cc:661-704, src/model.cc:838-924),
(c) internal invariants (Hermiticity, gs energy, dynamics pole position).
"""

from __future__ import annotations

import numpy as np
import pytest

from quantum_basis_tpu import Mopr, Opr
from tests.models_zoo import SP_HALF, heisenberg_chain


def _magnon_model(L):
    m, cons = heisenberg_chain(L, "1/2")
    m.Ham_vrnl = m.Ham  # generator = H (typical Trugman usage)
    return m, cons


def _seed_flip(space, L, sites):
    vals = np.zeros((1, space.n_slots), dtype=np.int64)
    for s in sites:
        vals[0, s] = 1
    return np.asarray(space.encode(vals), dtype=np.int64)


def test_one_magnon_dispersion():
    """One flipped spin on an all-up background: the vrnl basis is a single
    centered state and E(k) = L/4 - 1 + cos(2 pi k) exactly."""
    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    seeds = _seed_flip(space, L, [L // 2])
    sz_val = 0.5 * L - 1.0

    for kint in range(L):
        k = [kint / L]
        dim = m.build_basis_vrnl(seeds, gs_label, [0.0], k, depth=3,
                                 conserve_lst=[cons["Sz"]], val_lst=[sz_val])
        assert dim == 1
        m.generate_Ham_sparse_vrnl(0)
        sec = m.sec_vrnl[0]
        assert sec.gs_omega == 1
        assert abs(sec.gs_E0 - L / 4.0) < 1e-10  # all-up is an H eigenstate
        m.locate_E0_lanczos(which="vrnl")
        want = L / 4.0 - 1.0 + np.cos(2 * np.pi * kint / L)
        assert abs(m.eigenvals_vrnl[0] - want) < 1e-10


def _oracle_canon(L, pair):
    """Reference translate2center_OBC on a chain 2-flip state
    (src/basis.cc:661-704): disp = floor(center0 - center1 + 1e-12)."""
    center0 = (L - 1) / 2.0
    i, j = sorted(pair)
    d = int(np.floor(center0 - (i + j) / 2.0 + 1e-12))
    return tuple(sorted(((i + d) % L, (j + d) % L))), d


def _oracle_two_magnon(L, kfrac, seed_pair, depth):
    """Brute-force oracle: grow the canonical 2-flip basis from the seed by
    repeated H application + canonicalization (gen_mbasis_by_mopr +
    rm_mbasis_dulp_trans semantics, src/basis.cc:2842-2946), then build
    H(k) with e^{2 pi i k.disp} phases (src/model.cc:890-918)."""
    def hops(occ):
        out = []
        for b in range(L):
            s1, s2 = b, (b + 1) % L
            if s1 in occ and s2 not in occ:
                out.append(tuple(sorted((occ - {s1}) | {s2})))
            if s2 in occ and s1 not in occ:
                out.append(tuple(sorted((occ - {s2}) | {s1})))
        return out

    basis = {_oracle_canon(L, seed_pair)[0]}
    for _ in range(depth):
        new = set()
        for st in basis:
            for img in hops(set(st)):
                new.add(_oracle_canon(L, img)[0])
        basis |= new
    states = sorted(basis)
    index = {s: n for n, s in enumerate(states)}
    n = len(states)
    H = np.zeros((n, n), dtype=np.complex128)
    for col, (i, j) in enumerate(states):
        occ = {i, j}
        diag = 0.0
        for b in range(L):
            s1, s2 = b, (b + 1) % L
            z1 = -0.5 if s1 in occ else 0.5
            z2 = -0.5 if s2 in occ else 0.5
            diag += z1 * z2
        H[col, col] += diag
        for img in hops(occ):
            c, d = _oracle_canon(L, img)
            if c in index:
                H[index[c], col] += 0.5 * np.exp(-2j * np.pi * kfrac * d)
    return states, H


def test_two_magnon_vs_oracle():
    """Grown 2-flip vrnl basis and H(k) spectra match a brute-force oracle.

    L=12, depth=2 keeps the magnons away from the wrap, so the raw matrix
    is exactly Hermitian and the spectra are permutation-invariant."""
    L = 12
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    seeds = _seed_flip(space, L, [L // 2 - 1, L // 2])
    sz_val = 0.5 * L - 2.0

    for kint in [0, 1, 5]:
        kfrac = kint / L
        dim = m.build_basis_vrnl(seeds, gs_label, [0.0], [kfrac], depth=2,
                                 conserve_lst=[cons["Sz"]], val_lst=[sz_val])
        states, H_oracle = _oracle_two_magnon(
            L, kfrac, (L // 2 - 1, L // 2), 2)
        assert dim == len(states)
        m.generate_Ham_sparse_vrnl(0)
        # no boundary crossing: raw (non-completed) matrix is Hermitian
        H = m.sec_vrnl[0].vmat.at_momentum([kfrac], upper_triangle=False)
        np.testing.assert_allclose(np.linalg.eigvalsh(H),
                                   np.linalg.eigvalsh(H_oracle), atol=1e-10)
        # ... and the upper-triangle completion is then identical
        Hu = m.sec_vrnl[0].vmat.at_momentum([kfrac])
        np.testing.assert_allclose(Hu, H, atol=1e-12)


def test_vrnl_matvec_matches_dense():
    """Device MatvecVrnl agrees with the dense momentum matrix."""
    import jax.numpy as jnp

    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    seeds = _seed_flip(space, L, [2, 3])
    m.build_basis_vrnl(seeds, gs_label, [0.0], [2 / L], depth=6,
                       conserve_lst=[cons["Sz"]], val_lst=[0.5 * L - 2.0])
    mv = m.generate_Ham_sparse_vrnl(0)
    sec = m.sec_vrnl[0]
    H = sec.vmat.at_momentum(sec.momentum)
    rng = np.random.default_rng(3)
    x = rng.normal(size=sec.dim) + 1j * rng.normal(size=sec.dim)
    yr, yi = mv((jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy())))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(y, H @ x, atol=1e-10)


def test_vrnl_dynamics_single_pole():
    """B_q|gs> for the FM background is the one-magnon state: norm 1 and the
    continued fraction has a single pole at E(q)."""
    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    seeds = _seed_flip(space, L, [L // 2])
    kint = 3
    m.build_basis_vrnl(seeds, gs_label, [0.0], [kint / L], depth=2,
                       conserve_lst=[cons["Sz"]], val_lst=[0.5 * L - 1.0])
    m.generate_Ham_sparse_vrnl(0)
    # B_q = sum_x e^{i q x} S^-_x  (sqrt(N) A_q, cf. qbasis.h:1592-1594)
    Bq = Mopr()
    for x in range(L):
        Bq += complex(np.exp(2j * np.pi * kint * x / L)) * _as_mopr(x)
    norm, alphas, betas = m.measure_vrnl_dynamic(Bq, 0, m_steps=5)
    # norm is over vrnl-basis *coordinates* (reference blas_nrm2 of the
    # moprXgs_vrnl output, src/model.cc:2139-2141): the single canonical
    # one-magnon state receives amplitude sqrt(omega_g(GS)) = 1.
    assert abs(norm - 1.0) < 1e-9
    want = L / 4.0 - 1.0 + np.cos(2 * np.pi * kint / L)
    assert abs(float(alphas[0]) - want) < 1e-9


def _as_mopr(x):
    from quantum_basis_tpu.ops.operators import OprProd

    return Mopr([OprProd(1.0, [Opr(x, 0, False, SP_HALF["Sm"])])])


def test_moprXvec_vrnl_vs_oracle():
    """1-magnon -> 2-magnon sector mapping of B_q = sum_x e^{2 pi i q x} S-_x
    against a brute-force oracle; and pG capture for B'_q = sum e^{...} S+_x."""
    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    kint, qint = 1, 2
    # sector 0: one magnon at momentum k
    m.build_basis_vrnl(_seed_flip(space, L, [L // 2]), gs_label, [0.0],
                       [kint / L], depth=2,
                       conserve_lst=[cons["Sz"]], val_lst=[0.5 * L - 1.0])
    sec0 = m.sec_vrnl[0]
    assert sec0.dim == 1
    # sector 1: two magnons at momentum k + q (deep growth: all pair states)
    m.build_basis_vrnl(_seed_flip(space, L, [L // 2 - 1, L // 2]), gs_label,
                       [0.0], [(kint + qint) / L], depth=6,
                       conserve_lst=[cons["Sz"]], val_lst=[0.5 * L - 2.0],
                       sec=1)
    sec1 = m.sec_vrnl[1]

    Bq = Mopr()
    for x in range(L):
        Bq += complex(np.exp(2j * np.pi * qint * x / L)) * _as_mopr(x)
    x0 = np.asarray([1.0 + 0.0j])
    y, pG = m.moprXvec_vrnl(Bq, 0, 1, x0)
    assert abs(pG) < 1e-12

    # oracle: flip at center c; S-_x adds a flip at x (x != c); canonicalize;
    # coefficient e^{2 pi i q x} * e^{2 pi i k_new . d} (src/model.cc:2036-2051)
    c = int(np.floor((L - 1) / 2.0))  # canonical single-flip position
    lab_to_idx = {int(lab): i for i, lab in enumerate(sec1.labels)}
    y_oracle = np.zeros(sec1.dim, dtype=np.complex128)
    # map pair -> label through the same encoder used for seeds
    for x in range(L):
        if x == c:
            continue
        canon, d = _oracle_canon(L, (x, c))
        vals = np.zeros((1, space.n_slots), dtype=np.int64)
        vals[0, canon[0]] = 1
        vals[0, canon[1]] = 1
        lab = int(np.asarray(space.encode(vals))[0])
        coef = np.exp(2j * np.pi * qint * x / L) \
            * np.exp(2j * np.pi * (kint + qint) * d / L)
        y_oracle[lab_to_idx[lab]] += coef
    np.testing.assert_allclose(y, y_oracle, atol=1e-10)

    # pG: S+ operators bring the magnon back to the gs
    m.build_basis_vrnl(_seed_flip(space, L, [L // 2]), gs_label, [0.0],
                       [0.0], depth=2, conserve_lst=[cons["Sz"]],
                       val_lst=[0.5 * L], sec=2)
    Bp = Mopr()
    from quantum_basis_tpu.ops.operators import OprProd

    for x in range(L):
        Bp += complex(np.exp(-2j * np.pi * kint * x / L)) * Mopr(
            [OprProd(1.0, [Opr(x, 0, False, SP_HALF["Sp"])])])
    y2, pG2 = m.moprXvec_vrnl(Bp, 0, 2, x0)
    # gs sits at momentum 0 == sector-2 momentum, so gs_norm > 0 and the
    # amplitude is captured in pG, not y (src/model.cc:2034-2043)
    assert np.allclose(y2, 0.0, atol=1e-12)
    assert abs(pG2 - np.exp(-2j * np.pi * kint * c / L)) < 1e-10


def test_wannier_mat_one_magnon():
    """mu[k1,k2] = <phi(k1)|B_{k1-k2}|phi(k2)> for the one-magnon band with
    A_r = Sz_r: analytically -e^{2 pi i (k1-k2) c / L} off-diagonal
    (c = canonical flip position) and L/2 - 1 on the diagonal."""
    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    m.build_basis_vrnl(_seed_flip(space, L, [L // 2]), gs_label, [0.0],
                       [0.0], depth=2, conserve_lst=[cons["Sz"]],
                       val_lst=[0.5 * L - 1.0])
    m.generate_Ham_sparse_vrnl(0)
    Ar_list = [([float(r)], Opr(r, 0, False, SP_HALF["Sz"])) for r in range(L)]
    momenta = [[kk / L] for kk in range(4)]
    mu = m.wannier_mat_vrnl(Ar_list, momenta, lambda model, idx: 0, sec=0)
    c = int(np.floor((L - 1) / 2.0))
    for i1 in range(4):
        for i2 in range(4):
            if i1 == i2:
                want = 0.5 * L - 1.0
            else:
                want = -np.exp(2j * np.pi * (i1 - i2) * c / L)
            assert abs(mu[i1, i2] - want) < 1e-9, (i1, i2, mu[i1, i2], want)


def test_vrnl_static_measurement():
    """<phi|Sz_total|phi> = L/2 - 2 on any 2-magnon eigenvector."""
    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    seeds = _seed_flip(space, L, [3, 4])
    m.build_basis_vrnl(seeds, gs_label, [0.0], [1 / L], depth=6,
                       conserve_lst=[cons["Sz"]], val_lst=[0.5 * L - 2.0])
    m.generate_Ham_sparse_vrnl(0)
    m.locate_E0_lanczos(which="vrnl", nev=1, ncv=1)
    val = m.measure_vrnl_static(cons["Sz"], 0, 0)
    assert abs(val - (0.5 * L - 2.0)) < 1e-9


def test_wannier_mat_per_k_disk_cache(tmp_path, monkeypatch):
    """With checkpointing on, per-k eigen-solves are cached to disk: a rerun
    must not call eigh again (reference: per-k eigenvector files,
    src/model.cc:2163-2187)."""
    from quantum_basis_tpu import config

    monkeypatch.setattr(config, "enable_ckpt", True)
    monkeypatch.setattr(config, "ckpt_dir", str(tmp_path))

    L = 8
    m, cons = _magnon_model(L)
    space = m.space
    gs_label = int(np.asarray(space.encode(np.zeros((1, space.n_slots),
                                                    dtype=np.int64)))[0])
    m.build_basis_vrnl(_seed_flip(space, L, [L // 2]), gs_label, [0.0],
                       [0.0], depth=2, conserve_lst=[cons["Sz"]],
                       val_lst=[0.5 * L - 1.0])
    m.generate_Ham_sparse_vrnl(0)
    Ar_list = [([float(r)], Opr(r, 0, False, SP_HALF["Sz"])) for r in range(L)]
    momenta = [[kk / L] for kk in range(3)]
    mu1 = m.wannier_mat_vrnl(Ar_list, momenta, lambda model, idx: 0, sec=0)
    assert list(tmp_path.iterdir()), "no per-k cache files written"

    real_eigh = np.linalg.eigh

    def boom(*a, **k):
        raise AssertionError("eigh re-ran despite per-k disk cache")

    monkeypatch.setattr(np.linalg, "eigh", boom)
    try:
        mu2 = m.wannier_mat_vrnl(Ar_list, momenta, lambda model, idx: 0,
                                 sec=0)
    finally:
        monkeypatch.setattr(np.linalg, "eigh", real_eigh)
    np.testing.assert_allclose(mu2, mu1, atol=1e-12)
