"""Multi-chip/multi-host distribution: process-group init, mesh
construction, and sharded operator apply."""

from quantum_basis_tpu.parallel.mesh import basis_mesh
from quantum_basis_tpu.parallel.apply_sharded import MatvecSharded
from quantum_basis_tpu.parallel.halo_sharded import EllShardedHalo
from quantum_basis_tpu.parallel.enumerate_sharded import (
    enumerate_basis_dnc_sharded, enumerate_reps_dnc_sharded)
from quantum_basis_tpu.parallel.distributed import (global_basis_mesh,
                                                    init_distributed,
                                                    process_info,
                                                    shard_array_over_mesh)

__all__ = ["basis_mesh", "MatvecSharded", "EllShardedHalo",
           "enumerate_basis_dnc_sharded", "enumerate_reps_dnc_sharded",
           "init_distributed",
           "global_basis_mesh", "process_info", "shard_array_over_mesh"]
