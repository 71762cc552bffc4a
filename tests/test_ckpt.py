"""Checkpoint/restart: crash-consistency, corruption fallback, solver resume."""

import numpy as np
import pytest

from quantum_basis_tpu import config
from quantum_basis_tpu.utils.ckpt import CkptStore


def test_store_roundtrip(tmp_path):
    st = CkptStore(str(tmp_path))
    st.save("rec", {"a": np.arange(5), "x": 3.5, "n": 7})
    rec = st.load("rec")
    np.testing.assert_array_equal(rec["a"], np.arange(5))
    assert float(rec["x"]) == 3.5 and int(rec["n"]) == 7
    st.delete("rec")
    assert st.load("rec") is None


def test_store_corruption_returns_none(tmp_path):
    st = CkptStore(str(tmp_path))
    st.save("rec", {"a": np.arange(100)})
    path = st._path("rec")
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0xFF  # flip a byte mid-file
    open(path, "wb").write(bytes(data))
    assert st.load("rec") is None  # CRC or zip validation rejects


def test_store_truncation_returns_none(tmp_path):
    st = CkptStore(str(tmp_path))
    st.save("rec", {"a": np.arange(1000)})
    path = st._path("rec")
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    assert st.load("rec") is None


def test_thick_restart_resume(tmp_path, monkeypatch):
    """Interrupt eigs_smallest via maxit, resume from checkpoint, verify
    the resumed run completes and matches the dense eigenvalue."""
    monkeypatch.setattr(config, "enable_ckpt", True)
    monkeypatch.setattr(config, "ckpt_dir", str(tmp_path))

    from quantum_basis_tpu.solvers.restarted import eigs_smallest
    from test_solvers import _chain_setup

    mv, Hd, n = _chain_setup(10)  # dim 252
    evals = np.linalg.eigvalsh(Hd)

    # force an "interruption": too-few iterations to converge
    with pytest.raises(RuntimeError):
        eigs_smallest(mv, n, nev=2, ncv=8, maxit=9, ckpt_key="resume_test")
    files = list(tmp_path.iterdir())
    assert files, "no checkpoint written before the crash"

    # resume: loads the restart state and converges
    got, vecs = eigs_smallest(mv, n, nev=2, ncv=8, maxit=600,
                              ckpt_key="resume_test")
    np.testing.assert_allclose(got, evals[:2], atol=1e-9)
    # completed run cleans its checkpoint
    assert CkptStore(str(tmp_path)).load("resume_test") is None


def test_model_stage_checkpoint(tmp_path, monkeypatch):
    """Stage-level record: second locate_E0_lanczos call loads the stored
    eigenpair without re-running the solver."""
    monkeypatch.setattr(config, "enable_ckpt", True)
    monkeypatch.setattr(config, "ckpt_dir", str(tmp_path))

    from models_zoo import heisenberg_chain

    m, ops = heisenberg_chain(12)
    m.enumerate_basis_full([ops["Sz"]], [0.0])
    m.locate_E0_lanczos("full", nev=1, ncv=1)
    E0_first = m.eigenvals_full[0]
    assert CkptStore(str(tmp_path)).load("lczsE0_full_sec0_nev1") is not None

    # poison the solver: a second real run would crash; the stage record
    # must short-circuit it
    import quantum_basis_tpu.solvers.restarted as restarted

    def boom(*a, **k):
        raise AssertionError("solver re-ran despite stage checkpoint")

    monkeypatch.setattr(restarted, "eigs_smallest", boom)
    m2, ops2 = heisenberg_chain(12)
    m2.enumerate_basis_full([ops2["Sz"]], [0.0])
    m2.locate_E0_lanczos("full", nev=1, ncv=1)
    assert m2.eigenvals_full[0] == E0_first