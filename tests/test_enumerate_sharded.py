"""Distributed dnc enumeration: bit-identity with the host enumerators on
the 8-virtual-device mesh (SURVEY §5.8 basis enumeration/dedup; sample
sort's first production caller)."""

import numpy as np
import pytest

from quantum_basis_tpu.basis.enumerate import enumerate_basis, enumerate_basis_dnc
from quantum_basis_tpu.basis.translation import TranslationSet
from quantum_basis_tpu.basis.weisse import enumerate_reps_dnc
from quantum_basis_tpu.parallel import (basis_mesh,
                                        enumerate_basis_dnc_sharded,
                                        enumerate_reps_dnc_sharded)
from tests.models_zoo import fermi_hubbard_square, heisenberg_chain


@pytest.mark.multichip
def test_sharded_basis_enumeration_bit_identical():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    m, o = fermi_hubbard_square(4, 2)
    host = enumerate_basis_dnc(m.space, [o["Nup"], o["Ndn"]], [4.0, 4.0],
                               leaf=1 << 6)
    mesh = basis_mesh(8)
    dist = enumerate_basis_dnc_sharded(m.space, [o["Nup"], o["Ndn"]],
                                       [4.0, 4.0], mesh, leaf=1 << 6)
    np.testing.assert_array_equal(host, dist)
    assert host.size == 4900


@pytest.mark.multichip
def test_sharded_reps_enumeration_bit_identical():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    m, c = heisenberg_chain(12, "1/2")
    tset = TranslationSet(m.space, m.lattice)
    host, dim_h = enumerate_reps_dnc(tset, [c["Sz"]], [0.0],
                                     with_dim=True, block=1 << 10)
    mesh = basis_mesh(8)
    dist, dim_d = enumerate_reps_dnc_sharded(tset, [c["Sz"]], [0.0], mesh,
                                             block=1 << 10, with_dim=True)
    np.testing.assert_array_equal(host, dist)
    assert dim_h == dim_d == enumerate_basis(m.space, [c["Sz"]],
                                             [0.0]).size


def test_n_parts_matches_tile_select_union():
    """One-pass multi-part mode == per-rank tile_select calls, exactly."""
    m, o = fermi_hubbard_square(4, 2)
    args = (m.space, [o["Nup"], o["Ndn"]], [4.0, 4.0])
    P = 8
    parts = enumerate_basis_dnc(*args, leaf=1 << 6, n_parts=P)
    assert len(parts) == P
    for r in range(P):
        ref = enumerate_basis_dnc(*args, leaf=1 << 6,
                                  tile_select=(r, P), sort=False)
        np.testing.assert_array_equal(parts[r], ref)


@pytest.mark.multichip
def test_merge_shards_skewed_parts():
    """One dominant part must not overflow the sample-sort buckets: the
    merge rebalances rows before the device sort (regression: _PAD
    sentinels from max-size padding all landed in the last bucket)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from quantum_basis_tpu.parallel.enumerate_sharded import _merge_shards

    mesh = basis_mesh(8)
    rng = np.random.default_rng(0)
    big = rng.choice(1 << 40, size=20000, replace=False).astype(np.int64)
    parts = [big] + [np.empty(0, np.int64)] * 7  # all data on one rank
    out = _merge_shards(parts, mesh, "b")
    np.testing.assert_array_equal(out, np.sort(big))
