"""Pallas TPU block-sparse (BSR) SpMV kernel.

The TPU-native explicit-sparse kernel the north star names ("Pallas SpMV/SpMM
kernels feeding Lanczos"), replacing the reference's MKL CSR SpMV
(csr_mat::MultMv2, src/sparse.cc:262-307). Design rationale:

Arbitrary-index gathers (the ELL formulation ``x[cols]``) do not lower in
Mosaic — TPU vector memory has no scatter/gather unit; the only dynamic
shuffles are same-shape sublane/lane permutes (tpu.dynamic_gather). The
hardware-native sparse format is therefore **block sparse rows**: H is tiled
into (128, 128) dense blocks, only nonzero blocks are stored (sorted by row
tile), and the SpMV streams them from HBM through VMEM at full sequential
bandwidth:

    y2d[bi[b]] += A[b] @ x2d[bj[b]]        # one grid step per block

No index-dependent memory access happens inside the kernel: the block
coordinates (bi, bj) are **scalar-prefetched** (PrefetchScalarGridSpec) and
drive the BlockSpec index_maps, so the pipeline's double-buffered DMAs fetch
exactly the needed A/x/y tiles while the previous block computes. Blocks of
one row tile arrive consecutively; Pallas's revisiting semantics keep the
out tile resident in VMEM across them (flushed once per row tile), and a
prefetched ``first`` flag zero-initializes each fresh row tile.

This trades fill-in (a block stores 128*128 values however few nonzeros it
holds) for perfectly-coalesced HBM traffic and dense MXU math — the
structured-sparsity bargain on TPU. Cost model vs the XLA gather ELL: the
gather path's random x accesses run at ~1e8 elem/s; the BSR path runs at
HBM bandwidth over ``n_blocks * 64 KiB``, so it wins whenever
``blowup = stored/nnz`` stays below (bandwidth / 4B) / gather_rate ~ 1e3.
:func:`bsr_fill_stats` reports the measured blowup per matrix so callers
can choose (momentum-sector Hamiltonians in Lin order have strong block
locality from low-site hops; worst-case random structure does not).

Complex matrices use split-complex blocks (A_re, A_im) — the same
convention as the rest of the framework (ops/cplx.py): up to four real
block-matvec streams per apply. The diagonal stays a separate elementwise
pass, like every other engine here.

Production routing: explicit momentum-sector solves go through
``Model._repr_spmv``, which picks this kernel over the gather ELL when
``bsr_fill_stats`` reports blowup <= config.bsr_blowup_max on a TPU
backend. Tests run the kernel in interpret mode on CPU (bit-identical
math) and cross-check against the ELL apply on golden models, including a
full golden momentum-sector solve on BSR; ``benchmarks/bsr_bench.py``
runs it compiled on the chip and records nnz/s vs the gather ELL
(BSR_BENCH.json).
"""

from __future__ import annotations

import numpy as np

_B = 128  # block edge: sublane x lane tile of the (row, col) axes


def _ceil_to(x: int, m: int) -> int:
    return -(-int(x) // m) * m


# --------------------------------------------------------------------------
# Host-side conversion: ELL -> BSR
# --------------------------------------------------------------------------


def _ell_entries(ell):
    """Live (rows, cols, vre, vim-or-None) streams of an EllMatrix."""
    n, W = ell.n, ell.width
    cols = np.asarray(ell.cols, dtype=np.int64).reshape(-1)
    vre = np.asarray(ell.vre, dtype=np.float64).reshape(-1)
    vim = (np.asarray(ell.vim, dtype=np.float64).reshape(-1)
           if ell.vim is not None else None)
    rows = np.repeat(np.arange(n, dtype=np.int64), W)
    live = np.abs(vre) > 0.0
    if vim is not None:
        live |= np.abs(vim) > 0.0
    return (rows[live], cols[live], vre[live],
            vim[live] if vim is not None else None)


def bsr_fill_stats(ell, b: int = _B) -> dict:
    """Fill diagnostics without building device arrays: nnz, block count,
    fill factor nnz/(nb*b*b) and the stored/nnz blowup."""
    rows, cols, vre, _ = _ell_entries(ell)
    nbj = _ceil_to(ell.n, b) // b
    key = (rows // b) * nbj + cols // b
    uniq = np.unique(key)
    # + one explicit zero block per row tile no stored block maps to
    # (ell_to_bsr inserts those so every output tile gets written)
    covered = np.unique(uniq // nbj).size
    nb = uniq.size + (nbj - covered)
    nnz = rows.size
    stored = nb * b * b
    return {"nnz": int(nnz), "n_blocks": int(nb), "stored": int(stored),
            "fill": nnz / stored if stored else 0.0,
            "blowup": stored / max(nnz, 1)}


class BsrMatrix:
    """Device-resident block-sparse matrix + Pallas SpMV.

    Layout: ``blocks_re/_im (nb, 128, 128)`` dense values, ``bi/bj (nb,)``
    row/col tile indices sorted by (bi, bj), ``first (nb,)`` new-row-tile
    flags, ``diag (n_pad,)``. Protocol-compatible with
    :class:`~quantum_basis_tpu.ops.sparse.EllMatrix` (params/apply/nnz).
    """

    def __init__(self, n, blocks_re, blocks_im, bi, bj, diag,
                 interpret=False):
        import jax.numpy as jnp

        self.n = int(n)
        self.b = _B
        self.nb = int(bi.shape[0])
        self.is_complex = blocks_im is not None
        self.interpret = bool(interpret)
        self.n_pad = _ceil_to(max(self.n, 1), _B)
        bi = np.asarray(bi, dtype=np.int32)
        first = np.ones(self.nb, dtype=np.int32)
        if self.nb > 1:
            first[1:] = (bi[1:] != bi[:-1]).astype(np.int32)
        self.dtype = blocks_re.dtype
        self.blocks_re = jnp.asarray(blocks_re)
        self.blocks_im = (jnp.asarray(blocks_im)
                          if blocks_im is not None else None)
        dpad = np.zeros(self.n_pad, dtype=self.dtype)
        dpad[: self.n] = np.asarray(diag, dtype=self.dtype)
        self.diag = jnp.asarray(dpad)
        self._bi = jnp.asarray(bi)
        self._bj = jnp.asarray(np.asarray(bj, dtype=np.int32))
        self._first = jnp.asarray(first)

    # ------------------------------------------------------------- protocol

    @property
    def nnz(self) -> int:
        """Stored values incl. diagonal (block fill counts as stored)."""
        return self.nb * self.b * self.b + self.n

    @property
    def params(self):
        return (self.blocks_re, self.blocks_im, self.diag,
                self._bi, self._bj, self._first)

    def apply(self, params, x):
        """(xr, xi) -> (yr, yi); same protocol as EllMatrix.apply."""
        import jax.numpy as jnp

        blocks_re, blocks_im, diag, bi, bj, first = params
        xr, xi = x
        n, n_pad = self.n, self.n_pad

        def pad(v):
            if v is None:
                return None
            return jnp.pad(v.astype(self.dtype), (0, n_pad - n))

        def mv(blocks, v):
            return _bsr_matvec(blocks, bi, bj, first, v, self.interpret)

        xr_p, xi_p = pad(xr), pad(xi)
        yr = mv(blocks_re, xr_p) + diag * xr_p
        yi = None
        if xi_p is not None:
            yi = mv(blocks_re, xi_p) + diag * xi_p
        if blocks_im is not None:
            if xi_p is not None:
                yr = yr - mv(blocks_im, xi_p)
            yi_add = mv(blocks_im, xr_p)
            yi = yi_add if yi is None else yi + yi_add
        return (yr[:n], None if yi is None else yi[:n])

    def __call__(self, x):
        import jax

        return jax.jit(self.apply)(self.params, x)


def ell_to_bsr(ell, interpret: bool = False, dtype=None) -> BsrMatrix:
    """Convert an :class:`EllMatrix` to BSR (host-side block packing).

    Every output row tile gets at least one stored (possibly zero) block:
    the grid only writes the tiles its blocks map to, so a row tile with no
    off-diagonal block would otherwise return whatever was in its HBM/VMEM
    slot on real hardware (interpret mode zero-fills and hides this).
    """
    rows, cols, vre, vim = _ell_entries(ell)
    n = ell.n
    nbj = _ceil_to(max(n, 1), _B) // _B
    key = (rows // _B) * nbj + cols // _B
    uniq, inv = np.unique(key, return_inverse=True)
    # cover the row tiles no stored block maps to with explicit zero blocks
    covered = np.unique(uniq // nbj) if uniq.size else np.empty(0, np.int64)
    missing = np.setdiff1d(np.arange(nbj, dtype=np.int64), covered)
    nb = uniq.size + missing.size
    dt = np.dtype(dtype) if dtype is not None else np.asarray(ell.vre).dtype
    blocks_re = np.zeros((nb, _B, _B), dtype=np.float64)
    all_bi = np.concatenate([uniq // nbj, missing])
    all_bj = np.concatenate([uniq % nbj, np.zeros(missing.size, np.int64)])
    order = np.lexsort((all_bj, all_bi))
    rank = np.empty(nb, dtype=np.int64)
    rank[order] = np.arange(nb)
    if uniq.size:
        np.add.at(blocks_re, (rank[inv], rows % _B, cols % _B), vre)
    blocks_im = None
    if vim is not None and np.any(np.abs(vim) > 0.0):
        blocks_im = np.zeros((nb, _B, _B), dtype=np.float64)
        np.add.at(blocks_im, (rank[inv], rows % _B, cols % _B), vim)
    out_bi = all_bi[order].astype(np.int32)
    out_bj = all_bj[order].astype(np.int32)
    return BsrMatrix(n, blocks_re.astype(dt),
                     None if blocks_im is None else blocks_im.astype(dt),
                     out_bi, out_bj, np.asarray(ell.diag),
                     interpret=interpret)


# --------------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------------


def _bsr_matvec(blocks, bi, bj, first, x_pad, interpret):
    """y_pad = A x_pad (no diagonal) over the padded index space.

    One grid step per stored block; out/x tiles selected by the
    scalar-prefetched block coordinates. Call under jit (the callers do).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = x_pad.shape[0]
    nb = blocks.shape[0]
    dt = x_pad.dtype
    # (nbj, 1, 128) view: a (1, 1, 128) tile's trailing dims EQUAL the
    # array dims, satisfying Mosaic's (8, 128) minimum-tile rule — a flat
    # (nbj, 128) view with (1, 128) tiles does NOT lower compiled (the
    # sublane dim 1 is neither 8-divisible nor the full array dim;
    # interpret mode hid this)
    x3d = x_pad.reshape(n_pad // _B, 1, _B)

    # index maps must return a CONSISTENT integer width: under
    # jax_enable_x64 a literal 0 traces as i64 while the prefetched block
    # coordinates are i32 — the mixed tuple fails Mosaic legalization
    # ("failed to legalize operation 'func.func'", remote-compile 500),
    # compiled only; interpret mode hid it
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bi, bj, first
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _B, _B),
                         lambda b, bi, bj, first: (b, jnp.int32(0),
                                                   jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _B),
                         lambda b, bi, bj, first: (bj[b], jnp.int32(0),
                                                   jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _B),
                               lambda b, bi, bj, first: (bi[b], jnp.int32(0),
                                                         jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )

    def kernel(bi_ref, bj_ref, first_ref, blk_ref, x_ref, y_ref):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        # (1, 128) @ (128, 128)^T contraction: x tile dotted against the
        # block's columns; accumulate in the vector dtype (f32 on chip,
        # f64 in CPU tests). y[i] += sum_j A[i, j] x[j] computed as the
        # row-vector product x^T A^T.
        acc = jax.lax.dot_general(
            x_ref[0], blk_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt,
            # true-f32 products: the MXU default is bf16 inputs (~1e-3
            # relative — measured 6e-4 apply error before this), which
            # would poison even the f32 bulk-Krylov tier
            precision=jax.lax.Precision.HIGHEST,
        )
        y_ref[...] = y_ref[...] + acc.reshape(1, 1, _B).astype(dt)

    y3d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad // _B, 1, _B), dt),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bi, bj, first, blocks, x3d)
    return y3d.reshape(-1)
