"""Global configuration: precision constants, x64 setup, checkpoint flag.

Mirrors the reference's tolerance constants and ``initialize()`` entry point
(reference: src/miscellaneous.cc:44-112, src/qbasis.h:48-64), adapted to JAX:
``initialize`` enables float64, prints an environment banner, and toggles the
crash-consistent checkpoint subsystem.
"""

from __future__ import annotations

import os
import platform

import jax

# Double precision is mandatory for the 1e-8 golden-value contract: enable it
# eagerly at import so every module traces with x64 semantics.
jax.config.update("jax_enable_x64", True)

# Platform selection on hosts with a pre-registered accelerator plugin.
# The axon sitecustomize prepends itself to the platform list at interpreter
# start (env JAX_PLATFORMS=cpu -> config "axon,cpu", so the chip still wins).
# Re-assert the env var ONLY in that plugin-prepended form — an explicit
# in-process ``jax.config.update("jax_platforms", ...)`` (which leaves no
# plugin prefix) must NOT be clobbered: blindly re-applying the env here
# silently redirected "CPU" validation runs onto the tunneled chip.
# QBX_PLATFORM remains an unconditional override.
_envp = os.environ.get("QBX_PLATFORM") or ""
if not _envp:
    _want = os.environ.get("JAX_PLATFORMS") or ""
    if _want:
        try:
            _cur = jax.config.jax_platforms or ""
        except Exception:  # pragma: no cover - very old jax
            _cur = ""
        if _cur != _want and _cur.split(",", 1)[-1] == _want:
            _envp = _want
if _envp:
    try:
        jax.config.update("jax_platforms", _envp)
    except Exception:  # backend already initialized: too late, keep going
        pass

import numpy as np  # noqa: E402

# Numerical tolerances (reference: src/miscellaneous.cc:44-47).
machine_prec = float(np.finfo(np.float64).eps)
opr_precision = 1e-12       # for comparing operator matrix elements
sparse_precision = 1e-14    # entries below this are dropped from sparse H
lanczos_precision = 2e-12   # Lanczos convergence tolerance

# Crash-consistent checkpointing of long Krylov runs (reference: src/ckpt.cc:11).
enable_ckpt = False

# Mixed-precision Krylov (SURVEY §7.2 hard part #2): run the Lanczos bulk in
# float32 on the MXU-contraction engine, then polish in float64 from the f32
# Ritz vector. The final eigenpairs still meet the f64 solver tolerance; the
# f32 stage does ~all the SpMV work at the fast-engine rate. Off by default —
# enable per run via initialize(mixed_precision=True) or set directly.
mixed_precision = False

# f32-stage convergence target (residual, relative to |E|); the f64 polish
# stage then runs to the caller's tolerance from this warm start.
mixed_precision_f32_tol = 1e-5

# MXU pass count for the f32 dense kron bulk ("highest" = 6 bf16 passes =
# full f32; "high" = 3 passes, ~21-bit mantissa — still f32-class, ~2x the
# matmul rate on TPU). The bulk tier's output is always re-verified by the
# exact-f64 residual gate, so "high" is safe whenever the f32 stage still
# converges to mixed_precision_f32_tol; flip to "highest" if it stalls.
kron_f32_precision = "high"

# Directory for checkpoint files (reference uses ``out_Qckpt/``).
ckpt_dir = "out_Qckpt"

# f64 dot-product lowering: True -> elementwise-multiply + reduce (exact
# f64 everywhere; REQUIRED on TPU, where f64 dot_general is an emulation
# with only ~1e-10 relative accuracy, ~1e-8 fused); False -> dot_general
# (exact AND much faster on CPU/GPU native-f64 backends); None -> choose
# by backend at trace time.
f64_reduce_dots: bool | None = None


def use_f64_reduce_dots() -> bool:
    if f64_reduce_dots is not None:
        return bool(f64_reduce_dots)
    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")


# In-progress Krylov-basis records larger than this are skipped (the
# completion/stage records still save). Rationale: a restart-boundary save
# of a (ncv+1, N) basis pulls the whole buffer device->host; over a
# tunneled chip a ~1.7 GB pull takes minutes with zero host CPU, which
# both stalls the solver and trips liveness watchdogs. Crash cost without
# the record = redoing one solver stage from its warm start.
ckpt_max_bytes = 512 * 1024 * 1024

# When set, solvers append per-restart convergence lines here (the analog of
# the reference's log_Lanczos_<purpose>.txt / log_CG.txt, SURVEY §5.5).
solver_log_dir = None

# Persistent XLA compilation cache directory. OPT-IN via QBX_COMPILE_CACHE:
# on hosts with a remote-plugin backend (the tunneled bench chip) the cache
# machinery's backend/topology queries can block at initialize time, so the
# default stays off.
compilation_cache_dir = os.environ.get("QBX_COMPILE_CACHE", "")

# Label spaces up to this size get an O(1) direct position-lookup table on
# device; larger spaces fall back to binary search / Lin tables.
direct_lookup_max = 1 << 26


def initialize(enable_checkpoint: bool = False, quiet: bool = False,
               mixed_precision: bool | None = None) -> None:
    """Set up the library: x64, checkpoint flag, environment banner.

    TPU-native analog of ``qbasis::initialize`` (reference:
    src/miscellaneous.cc:49-112) — instead of CPUID/MKL/OpenMP reporting we
    report the JAX backend and device inventory.
    """
    global enable_ckpt
    enable_ckpt = bool(enable_checkpoint)
    if mixed_precision is not None:
        globals()["mixed_precision"] = bool(mixed_precision)
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: identical programs (e.g. the full-space
    # apply re-jitted per momentum sector, or a resumed run after
    # preemption) reuse their compiled executables from disk. On the
    # tunneled bench chip a large f64 apply compiles in minutes — paying it
    # once per program instead of once per jit instance is load-bearing.
    if compilation_cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:  # pragma: no cover - older jax
            pass
    if quiet:
        return
    print("=" * 64)
    print("quantum_basis_tpu")
    print(f"host       : {platform.node()}")
    print(f"jax        : {jax.__version__}")
    try:
        devs = jax.devices()
        print(f"backend    : {devs[0].platform} x{len(devs)}")
    except Exception as exc:  # pragma: no cover - device discovery is env-specific
        print(f"backend    : unavailable ({exc})")
    print(f"x64        : {jax.config.jax_enable_x64}")
    print(f"checkpoint : {'enabled -> ' + ckpt_dir if enable_ckpt else 'disabled'}")
    print(f"pid        : {os.getpid()}")
    print("=" * 64)


# ---------------------------------------------------------------- program keys
# Monotonic ids for solver program sharing (solvers key their jitted-ops
# caches on an operator template's ``program_key``; a recycled id() could
# alias two templates, so keys come from this counter instead).
import itertools as _itertools

_program_key_counter = _itertools.count(1)


def next_program_key() -> int:
    return next(_program_key_counter)


# --------------------------------------------------------- BSR engine routing
# Explicit momentum-sector/tilted solves route through the Pallas BSR SpMV
# kernel (ops/pallas_bsr.py) when the matrix's block fill-in blowup
# (stored / nnz, bsr_fill_stats) stays below this bound on a TPU backend.
# Measured compiled on the chip (BSR_BENCH.json, v5e): the kernel streams
# blocks at ~1.9e10 stored-vals/s while the gather ELL manages ~2.6e7
# nnz/s at 1e3-1e4-dim sectors — the kernel won every tested workload
# (blowups 84-374), measured break-even blowup ~690. 400 keeps margin.
# prefer_bsr = True/False overrides the routing entirely (tests force
# True with the interpreter on CPU). The compiled kernel is f32-only
# (Mosaic has no f64): production routing uses it as the bulk-Krylov
# tier with f64 ELL polish (Model._repr_bsr32).
bsr_blowup_max = 400.0
prefer_bsr = None

# Absolute HBM cap for routed BSR blocks (stored f32 values x 4 bytes, x2
# when complex): the blowup ratio alone would admit multi-GB block arrays
# at large sector dims. 2 GiB leaves room for Krylov state on a 16 GB chip.
bsr_stored_max_bytes = 2 << 30

# Dynamics auto-routing only CONSIDERS BSR below this sector dim: deciding
# requires building the explicit ELL (an extraction pass + a device->host
# pull), which is pure waste at dims where scattered momentum-sector
# structure makes rejection near-certain (tested winners are <= 1e4 rows).
# Solve paths that build the ELL anyway consult the stats directly.
bsr_auto_max_dim = 1 << 16


# KPM dynamics on momentum sectors: above this full label-space size the
# Chebyshev recurrence runs on the sector-dim repr row kernel instead of
# the projected full-space engine — the fused full-space recurrence
# program exceeds a 16 GB chip at N = 2^24 complex (measured: f64 compile
# OOM at 17 GB; f32 compiled but crashed the TPU worker at run).
kpm_fullspace_max_N = 1 << 23

# Chunk length for the full-space KPM recurrence: programs of <= this many
# scan steps with a device-resident carry between calls. One fused
# 190-step program crashed the TPU worker at N = 2^24 complex f32 where
# 128-step-class programs run fine; chunks keep each program in the
# proven class. None = single fused program.
kpm_fullspace_chunk = 64
