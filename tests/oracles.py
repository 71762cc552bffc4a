"""Independent brute-force oracles for tests.

Builds many-body matrices by explicit Kronecker products with Jordan-Wigner
parity strings — a construction entirely independent of the framework's
term-table compiler, so agreement is a real cross-check.

Slot convention must match quantum_basis_tpu.basis.state.StateSpace: slots
ordered orbital-major, slot 0 the least-significant label digit. With
np.kron(A, B) the SECOND factor's index is least significant, so the joint
operator over slots (0..S-1) is kron(M_{S-1}, ..., M_1, M_0).
"""

from __future__ import annotations

import numpy as np


def kron_chain(mats):
    """kron over slot operators, slot 0 least significant."""
    out = np.array([[1.0 + 0.0j]])
    for m in mats:  # slot 0 first => appears rightmost in successive krons
        out = np.kron(m, out)
    return out


def embed(space, factors):
    """Operator = product of (slot, matrix, fermion_flag) factors, applied
    right-to-left, with exact JW strings; returns dense (label_space^2)."""
    S = space.n_slots
    dims = [int(d) for d in space.dims]
    F = space.fermion_count_table

    def one(slot, mat, fermion):
        mats = []
        for s in range(S):
            if s == slot:
                mats.append(np.asarray(mat, dtype=np.complex128))
            elif fermion and s < slot:
                # JW parity factor (-1)^{F_s(v)}
                mats.append(np.diag((-1.0) ** F[s, : dims[s]]).astype(np.complex128))
            else:
                mats.append(np.eye(dims[s], dtype=np.complex128))
        return kron_chain(mats)

    total = np.eye(int(np.prod(dims, dtype=np.int64)), dtype=np.complex128)
    for slot, mat, fermion in factors:  # leftmost factor applied last
        total = total @ one(slot, np.atleast_2d(mat) if np.asarray(mat).ndim == 2
                            else np.diag(mat), fermion)
    return total


def mopr_dense(space, mopr):
    """Full-label-space dense matrix of a Mopr via the kron oracle."""
    if not hasattr(mopr, "terms"):  # accept OprProd / Opr
        from quantum_basis_tpu.ops.operators import Mopr, OprProd, Opr

        if isinstance(mopr, Opr):
            mopr = OprProd(1.0, [mopr])
        mopr = Mopr([mopr])
    D = space.label_space
    H = np.zeros((D, D), dtype=np.complex128)
    for term in mopr.terms:
        factors = []
        for f in term.factors:
            slot = space.slot(f.site, f.orbital)
            factors.append((slot, f.dense(), f.fermion))
        H += complex(term.coeff) * embed(space, factors)
    return H


def restrict(H_full, labels):
    """Restrict a full-label-space matrix to the given basis labels."""
    labels = np.asarray(labels)
    return H_full[np.ix_(labels, labels)]


# -- standard local operator matrices ---------------------------------------

SP_HALF = {
    "Sz": np.array([0.5, -0.5]),
    "Sp": np.array([[0, 1], [0, 0]], dtype=float),
    "Sm": np.array([[0, 0], [1, 0]], dtype=float),
}

TJ = {
    # local states |0>, |up>, |dn>
    "c_up": np.array([[0, 1, 0], [0, 0, 0], [0, 0, 0]], dtype=float),
    "c_dn": np.array([[0, 0, 1], [0, 0, 0], [0, 0, 0]], dtype=float),
}

ELECTRON = {
    # local states |0>, |up>, |dn>, |up dn>;  c_dn|up dn> = -|up>? convention:
    # state |up dn> = c_up† c_dn† |0>; c_up removes up: c_up|up dn> = |dn>;
    # c_dn|up dn> = c_dn c_up† c_dn† |0> = -c_up† c_dn c_dn† |0> = -|up>.
    "c_up": np.array([[0, 1, 0, 0],
                      [0, 0, 0, 0],
                      [0, 0, 0, 1],
                      [0, 0, 0, 0]], dtype=float),
    "c_dn": np.array([[0, 0, 1, 0],
                      [0, 0, 0, -1],
                      [0, 0, 0, 0],
                      [0, 0, 0, 0]], dtype=float),
}
