"""Krylov solver tests against dense eigensolves."""

import numpy as np
import pytest

from quantum_basis_tpu.basis.enumerate import enumerate_basis
from quantum_basis_tpu.basis.site_basis import SiteBasis
from quantum_basis_tpu.basis.state import StateSpace
from quantum_basis_tpu.ops.apply import DeviceBasis, MatvecFull
from quantum_basis_tpu.ops.compile import compile_operator
from quantum_basis_tpu.ops.dense import dense_matrix
from quantum_basis_tpu.solvers.lanczos import energy_scale, lanczos_ground
from quantum_basis_tpu.solvers.restarted import eigs_smallest
from quantum_basis_tpu.utils.rng import vec_randomize

from test_apply import heisenberg_mopr, sz_total


def _chain_setup(L, sz=0.0):
    space = StateSpace([(SiteBasis.named("spin-1/2"), L)])
    labels = enumerate_basis(space, [sz_total(L)], [sz])
    compiled = compile_operator(heisenberg_mopr(L), space)
    dbasis = DeviceBasis(space, labels)
    mv = MatvecFull(compiled, dbasis)
    Hd = dense_matrix(compiled, labels).real
    return mv, Hd, labels.size


def test_lanczos_ground_vs_dense():
    import jax.numpy as jnp

    mv, Hd, n = _chain_setup(10)  # dim 252
    evals = np.linalg.eigvalsh(Hd)
    re, _ = vec_randomize(n, seed=1)
    res = lanczos_ground(mv, (jnp.asarray(re), None), maxit=400, inner=20)
    assert abs(res["E0"] - evals[0]) < 1e-10
    # Ritz vector quality: ||Hv - E0 v|| small
    v = res["vector"]
    y = mv(v)
    resid = np.linalg.norm(np.asarray(y[0]) - res["E0"] * np.asarray(v[0]))
    assert resid < 1e-6


def test_lanczos_deflated_e1():
    import jax.numpy as jnp

    mv, Hd, n = _chain_setup(10)
    evals = np.linalg.eigvalsh(Hd)
    re, _ = vec_randomize(n, seed=1)
    res0 = lanczos_ground(mv, (jnp.asarray(re), None), maxit=400)
    re1, _ = vec_randomize(n, seed=5)
    res1 = lanczos_ground(mv, (jnp.asarray(re1), None), maxit=400,
                          deflate=(res0["vector"],))
    assert abs(res1["E0"] - evals[1]) < 1e-9


def test_thick_restart_smallest():
    mv, Hd, n = _chain_setup(10)
    evals = np.linalg.eigvalsh(Hd)
    got, vecs = eigs_smallest(mv, n, nev=4, ncv=16, maxit=600)
    np.testing.assert_allclose(got, evals[:4], atol=1e-9)
    # vectors are orthonormal eigenvectors
    for i, (vr, vi) in enumerate(vecs):
        v = np.asarray(vr)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-8)
        np.testing.assert_allclose(Hd @ v, got[i] * v, atol=1e-7)


def test_thick_restart_degenerate():
    """S=1/2 chain Sz=1 sector has degenerate levels; all must be found."""
    mv, Hd, n = _chain_setup(8, sz=1.0)
    evals = np.linalg.eigvalsh(Hd)
    got, _ = eigs_smallest(mv, n, nev=4, ncv=14, maxit=800)
    np.testing.assert_allclose(got, evals[:4], atol=1e-8)


def test_thick_restart_largest():
    mv, Hd, n = _chain_setup(10)
    evals = np.linalg.eigvalsh(Hd)
    got, _ = eigs_smallest(mv, n, nev=2, ncv=12, maxit=600, which="LA")
    np.testing.assert_allclose(got, evals[::-1][:2], atol=1e-9)


def test_energy_scale_bounds():
    import jax.numpy as jnp

    mv, Hd, n = _chain_setup(10)
    evals = np.linalg.eigvalsh(Hd)
    re, _ = vec_randomize(n, seed=2)
    lo, hi = energy_scale(mv, (jnp.asarray(re), None), m_steps=60)
    assert lo <= evals[0] and hi >= evals[-1]


def test_fullspace_polish_unconverged_raises(monkeypatch):
    """The large-N polish path must hard-fail (not silently publish a bad
    E0) when lanczos_ground exhausts maxit above its residual gate."""
    import jax.numpy as jnp

    import quantum_basis_tpu.models.model as mm
    from quantum_basis_tpu.ops.apply_fullspace import FullSpaceOp
    from tests.models_zoo import heisenberg_chain

    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    monkeypatch.setattr(mm, "_POLISH_N", 1)  # force the polish branch
    # deterministic unconverged outcome: stub the inner solver
    import quantum_basis_tpu.solvers.lanczos as lz

    def fake_ground(fs_, v0_, **kw):
        return {"E0": -5.0, "niter": kw.get("maxit", 0), "residual": 1e-5,
                "residual_bound": 1e-5, "alphas": None, "betas": None,
                "vector": v0_}

    monkeypatch.setattr(lz, "lanczos_ground", fake_ground)
    rng = np.random.default_rng(5)
    v0 = (jnp.asarray(rng.normal(size=fs.N) * np.asarray(fs.mask)), None)
    with pytest.raises(RuntimeError, match="unconverged") as ei:
        mm.Model._solve_fullspace(fs, nev=1, ncv=12, maxit=5, seed=1,
                                  complex_vec=False, ckpt_key=None, v0=v0)
    assert hasattr(ei.value, "E0") and hasattr(ei.value, "residual")
