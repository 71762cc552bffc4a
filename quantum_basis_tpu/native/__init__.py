"""Native host kernels (C++17) with transparent numpy fallback.

The extension (native/qbx_native.cpp) is compiled on first import with g++
and cached next to this package. Covered operations:

- ``compact_rows``: ELL row compaction (multithreaded C++), the host half of
  the explicit sparse build;
- ``lin_solve``: Lin-table BFS (reference: ALGraph::BSF_set_JaJb,
  src/miscellaneous.cc:640-708);
- ``vec_write`` / ``vec_read``: CRC32-checked chunked binary vector I/O
  (reference: vec_disk_read/write, src/miscellaneous.cc:391-471).

Set QBX_NO_NATIVE=1 to force the numpy fallbacks (used by tests to compare
both implementations).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_ext = None
_tried = False


def _build_and_load():
    global _ext, _tried
    if _tried:
        return _ext
    _tried = True
    if os.environ.get("QBX_NO_NATIVE"):
        return None
    here = os.path.dirname(os.path.abspath(__file__))
    # source lookup: packaged copy first (wheel installs), then the repo tree
    candidates = [
        os.path.join(here, "qbx_native.cpp"),
        os.path.normpath(os.path.join(here, "..", "..", "native",
                                      "qbx_native.cpp")),
    ]
    src = next((c for c in candidates if os.path.exists(c)), None)
    if src is None:
        return None
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "qbx_native" + suffix)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        include = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-march=native", "-funroll-loops",
               f"-I{include}", src, "-o", out, "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        except Exception:
            return None
    if here not in sys.path:
        sys.path.insert(0, here)
    try:
        import qbx_native  # noqa: F401

        _ext = qbx_native
    except Exception:
        _ext = None
    return _ext


def have_native() -> bool:
    return _build_and_load() is not None


# ------------------------------------------------------------- compact_rows


def compact_rows(cols, vre, vim, tol: float = 1e-14):
    """Merge duplicate columns per row; returns (cols, vre, vim) trimmed to
    the max surviving width. ``cols`` int64 (n, W) (invalid entries may be
    any value with |val| <= tol); arrays are modified in place when native.
    """
    def writable(a, dtype):
        a = np.ascontiguousarray(a, dtype=dtype)
        return a if a.flags.writeable else a.copy()

    ext = _build_and_load()
    n, W = cols.shape
    if ext is not None and n:
        cols = writable(cols, np.int64)
        vre = writable(vre, np.float64)
        vim_c = writable(vim, np.float64) if vim is not None else None
        width = ext.compact_rows(cols, vre,
                                 vim_c if vim_c is not None else None,
                                 n, W, tol)
        return (cols[:, :width], vre[:, :width],
                vim_c[:, :width] if vim_c is not None else None)
    from quantum_basis_tpu.ops.sparse import _compact_rows_np

    return _compact_rows_np(cols, vre, vim, tol)


# ---------------------------------------------------------------- lin_solve


def lin_solve(ia: np.ndarray, ib: np.ndarray, sa: int, sb: int):
    """Solve Ja[ia] + Jb[ib] = arange(n); raises ValueError if inconsistent.
    Returns (Ja, Jb) int64."""
    ext = _build_and_load()
    n = ia.size
    if ext is not None:
        Ja = np.zeros(sa, dtype=np.int64)
        Jb = np.zeros(sb, dtype=np.int64)
        ext.lin_solve(np.ascontiguousarray(ia, dtype=np.int64),
                      np.ascontiguousarray(ib, dtype=np.int64),
                      n, sa, sb, Ja, Jb)
        return Ja, Jb
    return None  # caller falls back to the numpy BFS


# ------------------------------------------------------------------ vec I/O


def vec_write(path: str, arr: np.ndarray) -> None:
    """CRC32-checked chunked write of a flat array (dtype preserved by the
    caller's convention)."""
    ext = _build_and_load()
    data = np.ascontiguousarray(arr)
    if ext is not None:
        ext.vec_write(path, data.view(np.uint8).reshape(-1))
        return
    import zlib

    raw = data.tobytes()
    with open(path, "wb") as f:
        f.write(np.uint64(len(raw)).tobytes())
        f.write(raw)
        f.write(np.uint32(zlib.crc32(raw)).tobytes())


def vec_read(path: str, dtype, shape=None) -> np.ndarray:
    """Read + validate a vector written by :func:`vec_write`."""
    ext = _build_and_load()
    if ext is not None:
        raw = ext.vec_read(path)
    else:
        import zlib

        with open(path, "rb") as f:
            n = int(np.frombuffer(f.read(8), dtype=np.uint64)[0])
            raw = f.read(n)
            crc = int(np.frombuffer(f.read(4), dtype=np.uint32)[0])
        if len(raw) != n or zlib.crc32(raw) != crc:
            raise ValueError("CRC mismatch")
    out = np.frombuffer(raw, dtype=dtype).copy()
    return out.reshape(shape) if shape is not None else out
