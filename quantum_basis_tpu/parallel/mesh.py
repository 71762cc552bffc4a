"""Device mesh helpers.

The framework's single scaling axis is the Hilbert-space (basis-row)
dimension — the analog of the reference's OpenMP row-parallel loops
(reference: src/model.cc:646-679 and §2.2 of SURVEY.md). A 1-D mesh over
all available devices shards basis rows; Lanczos reductions become psum,
and off-shard amplitude access is an all-gather of the source vector
(upgradeable to ragged all-to-all halo exchange for very large bases).
"""

from __future__ import annotations


def basis_mesh(n_devices: int | None = None, axis: str = "b"):
    """A 1-D ``jax.sharding.Mesh`` over the first ``n_devices`` devices."""
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))
