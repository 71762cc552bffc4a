"""Mesh-sharded tensor-factorized engine — the flagship's multi-chip path.

:class:`~quantum_basis_tpu.ops.apply_kron.KronOp` turns a factorizable
sector apply into two dense MXU matmuls plus an elementwise pass; here the
state matrix ``psi`` (na, nb) is sharded by rows (the up-factor index)
over a 1-D device mesh and the SAME apply is jitted under GSPMD:

- ``A @ psi``: ``A`` is laid out column-sharded so the contraction runs
  shard-local and XLA reduce-scatters the partial products back to the
  row-sharded layout (bytes moved per apply: one (na, nb) frame — the
  ``kron_product`` row of the communication roofline,
  benchmarks/comm_roofline.py);
- ``psi @ B^T``: ``B^T`` replicated, fully local;
- diagonal + coupling: row-sharded elementwise.

Rows are padded up to a multiple of the mesh size with explicit zero
rows (zero A-rows/cols, zero diagonal, zero coupling): padded components
of ``psi`` start at zero and stay exactly zero through every Krylov
operation, and the ``mask`` property lets the solvers keep random restarts
inside the physical subspace.

Same (params, apply) protocol as every other engine, so the thick-restart
/ RQI / rolling-Lanczos solvers run on it unchanged. Verified vs the
single-device KronOp at 1e-12 on the virtual 8-device mesh
(tests/test_kron_sharded.py) and through a REAL 2-process
``jax.distributed`` group (tests/test_multiprocess.py, engine="kron").

Reference: no analog — the reference is single-node OpenMP
(SURVEY §2.2); its largest Hubbard anchor is 4x2
(examples/trans_absent/latt_square/square_Fermi_Hubbard.cc:113).
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.ops.apply_kron import KronOp
from quantum_basis_tpu.ops.sparse import EllMatrix


def _pad_ell_rows(ell, npad: int):
    """EllMatrix with zero rows appended up to ``npad`` (zero diagonal,
    zero values, col 0 targets — inert under the ELL multiply-add)."""
    n = ell.n
    if npad == n:
        return ell
    W = ell.width
    cols = np.zeros((npad, W), dtype=np.int32)
    vre = np.zeros((npad, W), dtype=np.float64)
    if W:
        cols[:n] = np.asarray(ell.cols)
        vre[:n] = np.asarray(ell.vre)
    diag = np.zeros(npad, dtype=np.float64)
    diag[:n] = np.asarray(ell.diag)
    vim = None
    if ell.is_complex:
        vim = np.zeros((npad, W), dtype=np.float64)
        if W:
            vim[:n] = np.asarray(ell.vim)
    return EllMatrix(cols, vre, vim, diag)


class KronSharded:
    """KronOp over a 1-D mesh; see module docstring."""

    is_complex = False

    def __init__(self, A, B=None, coupling=None, coupling_scale: float = 1.0,
                 mesh=None, dtype=None, layout: str | None = None,
                 axis: str = "b"):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert mesh is not None, "KronSharded requires a mesh"
        self.mesh = mesh
        self.axis = axis
        ndev = int(np.prod(list(mesh.shape.values())))
        if B is None:
            B = A  # pass explicitly: padded A loses the B=None symmetry reuse
        na = A.n
        napad = -(-na // ndev) * ndev
        self.na_logical = na
        Apad = _pad_ell_rows(A, napad)
        Ppad = None
        if coupling is not None:
            Ppad = np.zeros((napad, B.n), dtype=np.asarray(coupling).dtype)
            Ppad[:na] = np.asarray(coupling)
        self.kron = KronOp(Apad, B, coupling=Ppad,
                          coupling_scale=coupling_scale, dtype=dtype,
                          layout=layout)
        self.dtype = self.kron.dtype
        self.layout = self.kron.layout
        self.na, self.nb = self.kron.na, self.kron.nb
        self.N = self.n = self.n_pad = self.na * self.nb
        self.n_logical = na * self.nb
        self.program_key = self.kron.program_key + (f"mesh{ndev}", axis)
        # stored nonzeros of the LOGICAL operator (nnz/s metrics)
        self.nnz_estimate = na * self.nb * (
            A.width + B.width + 1)

        row = P(axis)                      # flat vectors & adiag
        row2 = P(axis, None)               # (na, *) row-sharded
        rep = P()
        ns = lambda spec: NamedSharding(mesh, spec)
        put = lambda a, spec: jax.device_put(a, ns(spec))

        (Aside, Bside, adiag, bdiag, Pc) = self.kron.params
        if self.layout == "dense":
            # A column-sharded: the contraction dim matches psi's row
            # shards -> local partials + reduce-scatter
            Aside = (put(Aside[0], P(None, axis)),)
            Bside = (put(Bside[0], rep),)
        else:
            Aside = tuple(put(a, row2) for a in Aside)
            Bside = tuple(put(b, rep) for b in Bside)
        self._params = (Aside, Bside, put(adiag, row), put(bdiag, rep),
                        None if Pc is None else put(Pc, row2))
        self.sharding = ns(row)

        maskm = np.zeros((self.na, self.nb), dtype=np.float64)
        maskm[:na] = 1.0
        self.mask = put(jnp.asarray(maskm.reshape(-1)), row)

        # committed param/vector placements propagate; pin only the output
        self._jit_apply = jax.jit(self.kron.apply,
                                  out_shardings=(self.sharding, None))

    @property
    def params(self):
        return self._params

    def apply(self, params, x):
        # traceable path: GSPMD propagates the committed param shardings
        return self.kron.apply(params, x)

    def __call__(self, x):
        import jax

        xr, xi = x
        assert xi is None, "KronSharded is a real engine"
        xr = jax.device_put(xr, self.sharding)
        return self._jit_apply(self._params, (xr, None))

    # ------------------------------------------------ pad/unpad (solver IO)
    def pad(self, x):
        """Host/logical flat vector (na_logical*nb) -> padded sharded."""
        import jax
        import jax.numpy as jnp

        def one(v):
            if v is None:
                return None
            v = np.asarray(v)
            vp = np.zeros((self.na, self.nb), dtype=v.dtype)
            vp[: self.na_logical] = v.reshape(self.na_logical, self.nb)
            return jax.device_put(jnp.asarray(vp.reshape(-1)), self.sharding)

        return (one(x[0]), one(x[1]))

    def unpad(self, x):
        re = np.asarray(x[0]).reshape(self.na, self.nb)[
            : self.na_logical].reshape(-1)
        im = None
        if x[1] is not None:
            im = np.asarray(x[1]).reshape(self.na, self.nb)[
                : self.na_logical].reshape(-1)
        return (re, im)
