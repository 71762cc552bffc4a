"""Conjugate-gradient eigenvector refinement.

TPU-native port of the reference's ``eigenvec_CG`` (src/lanczos.cc:281-341):
given a converged eigenvalue E0, drive (H - E0) v -> 0 by CG with the
restart-on-renormalize logic of the reference (re-normalize v, recompute
r = (E0 - H) v, restart the Krylov direction). The whole iteration is one
``lax.while_loop`` — no host round-trips; BLAS1 ops are fused by XLA.

Use cases match the reference: polish an eigenvector from a coarser solve
(e.g. a mixed-precision Lanczos run) to full f64 solver tolerance, or
recover V0/V1 from checkpointed energies without storing Krylov bases.
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu.ops import cplx as cx


def eigenvec_cg(matvec, E0: float, v0, maxit: int = 1000, tol: float = 2e-12):
    """Refine v0 toward the E0 eigenvector.

    matvec follows the (params, apply) protocol; v0 is a split-complex cvec.
    Returns (v, residual_norm, iterations). The residual is
    ||(H - E0) v|| with ||v|| = 1 (the reference's `accu`).
    """
    import jax
    import jax.numpy as jnp

    params = matvec.params
    complex_vec = v0[1] is not None

    def as_pair(x):
        return (x[0], x[1] if complex_vec else jnp.zeros_like(x[0]))

    def hs(x):
        """(H - E0) x."""
        xx = (x[0], x[1] if complex_vec else None)
        y = matvec.apply(params, xx)
        y = (y[0], y[1] if y[1] is not None else
             (jnp.zeros_like(y[0]) if complex_vec else None))
        out = cx.axpy(-float(E0), xx, y)
        return as_pair(out)

    def restart(v):
        rn = cx.norm(v)
        v = cx.scale(v, 1.0 / jnp.maximum(rn, 1e-300))
        r = cx.scale(hs(v), -1.0)                       # r = (E0 - H) v
        return v, r, r, cx.norm(r)

    def body(carry):
        m, v, r, p, gamma, _ = carry

        def do_restart(_):
            vn, rn_, pn, g = restart(v)
            # done if the fresh residual is already converged, or v was
            # already unit-norm (reference: break without restart)
            was_unit = jnp.abs(cx.norm(v) - 1.0) <= tol
            done = (g < tol) | was_unit
            return m + 1, vn, rn_, pn, g, done

        def do_step(_):
            pp = hs(p)
            delta_re, delta_im = cx.vdot(p, pp)
            delta = delta_re  # Hermitian H: <p, (H-E0)p> is real
            alpha = gamma * gamma / delta
            vn = cx.axpy(alpha, p, v)
            rn_ = cx.axpy(-alpha, pp, r)
            g2 = cx.norm(rn_)
            beta = g2 / jnp.maximum(gamma, 1e-300)
            pn = cx.add(rn_, cx.scale(p, beta * beta))
            return m + 1, vn, rn_, pn, g2, jnp.asarray(False)

        return jax.lax.cond(gamma < tol, do_restart, do_step, None)

    def cond(carry):
        m, _, _, _, _, done = carry
        return (~done) & (m < maxit)

    v0p = as_pair((v0[0], v0[1]))
    v, r, p, gamma = restart(v0p)
    init = (jnp.asarray(1), v, r, p, gamma, jnp.asarray(False))

    @jax.jit
    def run(init):
        return jax.lax.while_loop(cond, body, init)

    m, v, r, p, gamma, _ = run(init)
    rn = cx.norm(v)
    v = cx.scale(v, 1.0 / float(rn))
    res = float(cx.norm(hs(v)))
    out = (v[0], v[1] if complex_vec else None)
    return out, res, int(m)
