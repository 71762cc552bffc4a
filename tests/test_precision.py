"""f64 reduction-lowering guarantees + the mixed-precision RQI polish.

On the TPU backend an f64 ``dot_general`` lowers to an MXU emulation with
only ~1e-10 relative accuracy (~1e-8 when fused with upstream compute) —
measured on chip; it silently capped every solver at ~1e-8 eigenvalue
error in round 3. All precision-critical dot products must therefore lower
to elementwise-multiply + reduce (exact f64 on the VPU). These tests pin
that lowering by inspecting the jaxpr/HLO, so a refactor back to
``jnp.vdot``/``jnp.matmul`` fails on CPU CI rather than on the chip.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_basis_tpu.ops import cplx as cx


@pytest.fixture
def force_reduce_dots():
    """Force the TPU-style f64 reduce lowering (tests run on CPU, where
    the auto mode keeps fast exact dot_general)."""
    from quantum_basis_tpu import config

    old = config.f64_reduce_dots
    config.f64_reduce_dots = True
    yield
    config.f64_reduce_dots = old


def _jaxpr_str(fn, *args):
    return str(jax.make_jaxpr(fn)(*args))


def test_cx_vdot_f64_lowers_to_reduce(force_reduce_dots):
    a = jnp.zeros(16, jnp.float64)
    assert "dot_general" not in _jaxpr_str(
        lambda x, y: cx.vdot_re((x, None), (y, None)), a, a)
    assert "dot_general" not in _jaxpr_str(
        lambda x, y: cx.vdot((x, x), (y, y)), a, a)
    assert "dot_general" not in _jaxpr_str(
        lambda x: cx.norm((x, x)), a)


def test_cx_vdot_f32_keeps_dot_general():
    """The f32 engine path wants the MXU: f32 dots stay dot_general."""
    a = jnp.zeros(16, jnp.float32)
    assert "dot_general" in _jaxpr_str(
        lambda x, y: cx.vdot_re((x, None), (y, None)), a, a)


def test_restarted_deviceops_f64_avoids_dot_general(force_reduce_dots):
    """The CGS2 projection/subtraction/compaction of the thick-restart
    solver must not emit dot_general at f64 (orthogonality was measured at
    4e-8 on chip through the matmul path, 1e-14 through reduce)."""
    from quantum_basis_tpu.solvers.restarted import _DeviceOps

    class _Id:
        def apply(self, params, x):
            return x

        params = ()

    n, ncv = 64, 6
    ops = _DeviceOps(_Id(), n, ncv, False)
    V = jnp.zeros((ncv + 1, n), jnp.float64)
    jx = str(jax.make_jaxpr(
        lambda V: ops.step.__wrapped__(V, jnp.zeros((1, 1)), 0, ()))(V))
    assert "dot_general" not in jx
    S = jnp.zeros((ncv + 1, 3), jnp.float64)
    jc = str(jax.make_jaxpr(
        lambda V, S: ops.compact.__wrapped__(V, jnp.zeros((1, 1)), S,
                                             jnp.zeros_like(S), 4))(V, S))
    assert "dot_general" not in jc


def test_rqi_polish_reaches_f64_tolerance():
    """Mixed-precision RQI: f32 warm start + f64 residual/f32 correction
    must reach ~1e-10-class residuals, beating the warm start by orders of
    magnitude."""
    from tests.models_zoo import heisenberg_chain
    from quantum_basis_tpu.ops.apply_fullspace import FullSpaceOp
    from quantum_basis_tpu.ops.apply_contract import ContractOp
    from quantum_basis_tpu.solvers.restarted import eigs_smallest
    from quantum_basis_tpu.solvers.rqi import rqi_polish

    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_full([c["Sz"]], [0.0])
    s = m.sec_full[0]
    fs = FullSpaceOp(m.compiled_Ham, s.labels)
    fs32 = ContractOp(m.compiled_Ham, s.labels, dtype=jnp.float32)
    _, v32 = eigs_smallest(fs32, fs32.N, nev=1, ncv=12, maxit=2000, seed=1,
                           complex_vec=False, mask=fs32.mask, tol=3e-6)
    out = rqi_polish(fs, v32[0], fs32=fs32)
    assert out["converged"], out
    assert out["residual"] < 3e-9, out["residual"]
    # golden: E0(L=12 chain, Sz=0)
    assert abs(out["E0"] - (-5.387390917445)) < 1e-9


def test_rqi_polish_momentum_sector_complex():
    """Complex (k != 0) sector through the projected full-space ops."""
    from tests.models_zoo import heisenberg_chain

    m, c = heisenberg_chain(12, "1/2")
    m.enumerate_basis_repr([3], [c["Sz"]], [0.0])
    sec = m.sec_repr[0]
    fs = m._fullspace_repr_op(sec)
    fs32 = m._fullspace_repr_op(sec, dtype=jnp.float32)
    if fs is None or fs32 is None:
        pytest.skip("projected full-space path unsupported here")
    from quantum_basis_tpu.solvers.restarted import eigs_smallest
    from quantum_basis_tpu.solvers.rqi import rqi_polish

    _, v32 = eigs_smallest(fs32, fs32.N, nev=1, ncv=12, maxit=2000, seed=1,
                           complex_vec=True, mask=fs32.mask, tol=3e-6)
    out = rqi_polish(fs, v32[0], fs32=fs32)
    assert out["converged"], out
    assert out["residual"] < 3e-9
    # cross-check against the direct repr ELL solve
    m2, c2 = heisenberg_chain(12, "1/2")
    m2.enumerate_basis_repr([3], [c2["Sz"]], [0.0])
    m2.locate_E0_lanczos(which="repr", maxit=2000)
    assert abs(out["E0"] - float(m2.eigenvals_repr[0])) < 1e-8


def test_momentum_sector_program_sharing():
    """All momentum sectors must share ONE operator template (and thus one
    set of compiled solver programs): a fresh jax.jit object recompiles an
    identical program from scratch, which cost minutes per sector on the
    tunneled chip."""
    from tests.models_zoo import heisenberg_chain
    from quantum_basis_tpu.solvers.restarted import _device_ops

    m, c = heisenberg_chain(12, "1/2")
    views = []
    for k in (1, 2, 3):
        m.enumerate_basis_repr([k], [c["Sz"]], [0.0])
        fs = m._fullspace_repr_op(m.sec_repr[0])
        if fs is None:
            pytest.skip("projected full-space path unsupported here")
        views.append(fs)
    assert views[0]._template is views[1]._template is views[2]._template
    assert views[0].program_key == views[2].program_key
    # k=0 (real phases) joins the same complex-structure template
    m.enumerate_basis_repr([0], [c["Sz"]], [0.0])
    v0 = m._fullspace_repr_op(m.sec_repr[0])
    assert v0._template is views[0]._template
    assert v0.is_complex
    ops_a = _device_ops(views[0], views[0].N, 8, True)
    ops_b = _device_ops(views[1], views[1].N, 8, True)
    assert ops_a is ops_b
    ops_c = _device_ops(views[1], views[1].N, 9, True)  # new shape -> new ops
    assert ops_c is not ops_a
