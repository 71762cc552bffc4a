"""Basis persistence: CRC-validated label-array save/load.

Counterpart of the reference's ``basis_disk_write/read``
(src/miscellaneous.cc:474-547), which serializes the enumerated
``vector<mbasis_elem>`` with a CRC32 so long enumerations survive restarts.
Here a basis is a sorted int64 label array; the binary format (length prefix
+ payload + CRC32) is shared with the checkpoint vector I/O and implemented
natively in C++ when available (native/qbx_native.cpp).
"""

from __future__ import annotations

import numpy as np

from quantum_basis_tpu import native

_MAGIC = np.int64(0x7162786C61626C73)  # "qbxlabls"


def basis_save(path: str, labels: np.ndarray) -> None:
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    payload = np.concatenate([np.asarray([_MAGIC, labels.size],
                                         dtype=np.int64), labels])
    native.vec_write(path, payload)


def basis_load(path: str) -> np.ndarray:
    payload = native.vec_read(path, np.int64)
    if payload.size < 2 or payload[0] != _MAGIC:
        raise ValueError(f"{path}: not a basis file")
    n = int(payload[1])
    if payload.size != n + 2:
        raise ValueError(f"{path}: length mismatch")
    return payload[2:].copy()
