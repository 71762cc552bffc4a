"""Crash-consistent checkpoint store for long Krylov runs.

Re-design of the reference's two-phase-commit checkpoint files
(reference: src/ckpt.cc, src/model.cc:2521-2749). The reference writes
`.Qckpt1/.Qckpt2` marker files and replays/rewinds on restart; here each
record is one `.npz` bundle written to a temp file and published with an
atomic ``os.replace`` — crash-consistent by construction on POSIX — with
CRC32 validation of every array payload on load (the reference CRC-checks
each vector file the same way, src/miscellaneous.cc:391-471). A corrupt or
truncated record loads as ``None`` (callers fall back to a cold start).

Records live under ``config.ckpt_dir`` (default ``out_Qckpt/``, matching
the reference's directory name).
"""

from __future__ import annotations

import os
import zlib

import numpy as np

from quantum_basis_tpu import config


class CkptStore:
    """Atomic, CRC-validated named checkpoint records."""

    def __init__(self, root: str | None = None):
        self.root = root or config.ckpt_dir

    def _path(self, key: str) -> str:
        safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in key)
        return os.path.join(self.root, safe + ".Qckpt.npz")

    def save(self, key: str, payload: dict) -> None:
        """Write a record atomically. Values: numpy arrays or scalars."""
        os.makedirs(self.root, exist_ok=True)
        arrays = {}
        crcs = {}
        for name, val in payload.items():
            arr = np.asarray(val)
            arrays[name] = arr
            crcs[name] = zlib.crc32(np.ascontiguousarray(arr).tobytes())
        order = sorted(arrays)
        arrays["__crc__"] = np.asarray([crcs[n] for n in order], dtype=np.uint32)
        arrays["__names__"] = np.asarray(order)
        path = self._path(key)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def load(self, key: str):
        """Load and validate a record; None if absent/corrupt/stale-format."""
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            with np.load(path, allow_pickle=False) as z:
                names = [str(n) for n in z["__names__"]]
                crcs = z["__crc__"]
                out = {}
                for i, name in enumerate(names):
                    arr = z[name]
                    if zlib.crc32(np.ascontiguousarray(arr).tobytes()) != int(crcs[i]):
                        return None
                    out[name] = arr
                return out
        except Exception:
            return None

    def delete(self, key: str) -> None:
        path = self._path(key)
        if os.path.exists(path):
            os.remove(path)


def active_store():
    """The global store if checkpointing is enabled, else None."""
    return CkptStore() if config.enable_ckpt else None
