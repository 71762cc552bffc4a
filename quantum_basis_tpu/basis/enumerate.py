"""Sector-filtered basis enumeration — embarrassingly parallel on device.

TPU-native replacement for the reference's chunked OpenMP scan over all d^N
product states (reference: src/basis.cc:998-1109): generate candidate labels
as ``iota`` chunks, decode to slot values, evaluate the conserved diagonal
operators as vectorized table lookups, and keep labels passing the filter.
The result is sorted by construction (chunks scan ascending label order).
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.basis.state import StateSpace
from quantum_basis_tpu.ops.compile import compile_diagonal

_QN_TOL = 1e-5  # quantum-number match tolerance (reference: basis.cc:1068)


def enumerate_basis(
    space: StateSpace,
    conserve_lst=None,
    val_lst=None,
    chunk: int = 1 << 22,
) -> np.ndarray:
    """Enumerate all labels whose conserved diagonal quantum numbers match.

    Parameters mirror ``model::enumerate_basis_full`` (reference:
    src/model.cc:253-271): ``conserve_lst`` is a list of diagonal Mopr,
    ``val_lst`` the target values. Returns sorted int64 labels (host array).
    """
    import jax
    import jax.numpy as jnp

    conserve_lst = conserve_lst or []
    val_lst = val_lst or []
    if len(conserve_lst) != len(val_lst):
        raise ValueError("conserve_lst and val_lst must have equal length")

    total = space.label_space
    evals = [compile_diagonal(m, space) for m in conserve_lst]
    vals = [float(v) for v in val_lst]

    if not evals:
        return np.arange(total, dtype=np.int64)

    chunk = int(min(chunk, total))

    if total <= (1 << 26):
        # host fast path: vectorized numpy scan (the compiled diagonal
        # evaluators dispatch on the array namespace). The device loop below
        # pays a dispatch + decode round-trip per chunk, which measured
        # ~50x slower than this for the 2^24 chain on a tunneled TPU.
        pow2 = all(int(d) & (int(d) - 1) == 0 for d in space.dims)
        shifts = [int(s).bit_length() - 1 for s in space.strides]
        keep = []
        for start in range(0, total, chunk):
            labels = np.arange(start, min(start + chunk, total),
                               dtype=np.int64)
            V = np.empty((labels.size, space.n_slots), dtype=np.int32)
            for s in range(space.n_slots):
                if pow2:
                    # shift/mask decode: ~30x faster than int64 // and %
                    V[:, s] = (labels >> shifts[s]) & (int(space.dims[s]) - 1)
                else:
                    V[:, s] = (labels // int(space.strides[s])) \
                        % int(space.dims[s])
            ok = np.ones(labels.size, dtype=bool)
            for ev, v in zip(evals, vals):
                ok &= np.abs(ev(V) - v) < _QN_TOL
            if ok.any():
                keep.append(labels[ok])
        if not keep:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(keep)

    @jax.jit
    def chunk_mask(start):
        labels = start + jnp.arange(chunk, dtype=jnp.int64)
        V = space.decode(labels)
        ok = labels < total
        for ev, v in zip(evals, vals):
            ok = ok & (jnp.abs(ev(V) - v) < _QN_TOL)
        return ok

    keep = []
    for start in range(0, total, chunk):
        mask = np.asarray(chunk_mask(np.int64(start)))
        idx = np.flatnonzero(mask)
        if idx.size:
            keep.append(start + idx.astype(np.int64))
    if not keep:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(keep)
