"""Distributed basis enumeration: dnc tiles over the mesh + sample-sort merge.

SURVEY §5.8's "basis enumeration/dedup across hosts": the meet-in-the-middle
divide-and-conquer enumerators (basis/enumerate.py::enumerate_basis_dnc,
basis/weisse.py::enumerate_reps_dnc) stream their top-level cross-product
tiles; here each mesh slot computes only its round-robin subset of tiles and
the per-shard (unsorted) label lists are merged into global sorted order by
the distributed sample sort (parallel/sample_sort.py — this is its
production caller). On one process the per-rank passes run serially but the
data path (local enumerate -> all_to_all bucket exchange -> local sort) is
exactly the multi-host structure; tests assert bit-identity with the
single-host enumerators on the 8-virtual-device mesh.

Reference analog: the OpenMP chunked enumeration + gnu-parallel sort
(src/basis.cc:1045-1104) — shared-memory only; across hosts this is the
honest replacement.
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.parallel.sample_sort import _PAD, sample_sort_sharded


def _merge_shards(parts, mesh, axis: str):
    """Globally sort per-rank label lists via the distributed sample sort.

    Rows are REBALANCED to equal size before the device sort: padding each
    rank's row to the largest part would send every _PAD sentinel to the
    last sample-sort bucket, overflowing it on skewed tile assignments
    (one dominant quantum-number bucket pair can give one rank most
    labels). Equal rows bound the pad count at 128*P total.
    """
    P = int(mesh.shape[axis])
    assert len(parts) == P
    allx = np.concatenate([p for p in parts if p.size]) \
        if any(p.size for p in parts) else np.empty(0, np.int64)
    n_local = max(-(-allx.size // P // 128) * 128, 128)
    xs = np.full((P, n_local), _PAD, dtype=np.int64)
    for r in range(P):
        row = allx[r * n_local: (r + 1) * n_local]
        xs[r, : row.size] = row
    y, counts, over = sample_sort_sharded(xs, mesh, axis)
    if over:
        y, counts, over = sample_sort_sharded(xs, mesh, axis, slack=8.0)
        if over:
            raise RuntimeError("sample_sort bucket overflow; raise slack")
    out = np.concatenate([y[p, : int(counts[p])] for p in range(P)]) \
        if P else np.empty(0, np.int64)
    return out[out < _PAD]


def enumerate_basis_dnc_sharded(space, conserve_lst, val_lst, mesh,
                                axis: str = "b", leaf: int = 1 << 22):
    """Sector enumeration with dnc tiles distributed over the mesh.

    Returns sorted labels bit-identical to ``enumerate_basis_dnc``, or
    None when a conserved operator is not separable (caller falls back).
    """
    from quantum_basis_tpu.basis.enumerate import enumerate_basis_dnc

    P = int(mesh.shape[axis])
    # single-controller: all ranks' tile subsets in ONE dnc pass (the
    # meet-in-the-middle halves are shared, not recomputed per rank). On a
    # true multi-process group each process would instead call
    # enumerate_basis_dnc(tile_select=(its_rank, P)) and feed only its own
    # shard — the data path below (bucket exchange + local sorts) is
    # identical either way.
    parts = enumerate_basis_dnc(space, conserve_lst, val_lst, leaf=leaf,
                                n_parts=P)
    if parts is None:
        return None
    return _merge_shards(parts, mesh, axis)


def enumerate_reps_dnc_sharded(tset, conserve_lst, val_lst, mesh,
                               axis: str = "b", block: int = 1 << 20,
                               with_dim: bool = False):
    """Momentum-representative enumeration with streamed tiles distributed
    over the mesh; bit-identical to ``enumerate_reps_dnc`` (the sector
    dimension is summed across ranks)."""
    from quantum_basis_tpu.basis.weisse import enumerate_reps_dnc

    P = int(mesh.shape[axis])
    parts = []
    dim = 0
    for r in range(P):
        part, d = enumerate_reps_dnc(tset, conserve_lst, val_lst,
                                     block=block, with_dim=True,
                                     tile_select=(r, P), sort=False)
        parts.append(part)
        dim += d
    out = _merge_shards(parts, mesh, axis)
    return (out, dim) if with_dim else out
