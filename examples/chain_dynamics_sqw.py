"""Dynamical structure factor S(q, w) of the spin-1/2 Heisenberg chain.

Mirrors the reference workflow of
examples/trans_absent/latt_chain/chain_Heisenberg_spin_half.cc (dynamics
run) + examples/trans_absent/latt_chain/plot_sqw.py (continued-fraction
reconstruction): compute |v> = Sz_q |gs>, run fixed-step Lanczos for the
(a, b) coefficients, reconstruct S(q, w), and write a heatmap PNG.

Run:  python examples/chain_dynamics_sqw.py [L] [out.png]
"""

from __future__ import annotations

import os
import sys

try:  # installed package preferred; fall back to the repo tree
    import quantum_basis_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from quantum_basis_tpu import Mopr, Opr
from quantum_basis_tpu.ops.operators import OprProd
from quantum_basis_tpu.postprocess import plot_sqw
from examples.chain_heisenberg_spin_half import SZ, build


def main(L=12, out="sqw_chain.png"):
    m, Sz_tot = build(L)
    m.enumerate_basis_full([Sz_tot], [0.0])
    m.locate_E0_lanczos(nev=1, ncv=1)
    E0 = m.eigenvals_full[0]
    print(f"E0 = {E0:.9f}")

    runs = []
    qs = list(range(1, L))
    for qi in qs:
        q = 2.0 * np.pi * qi / L
        A = Mopr()
        for x in range(L):
            A += complex(np.exp(-1j * q * x) / np.sqrt(L)) * Mopr(
                [OprProd(1.0, [Opr(x, 0, False, SZ)])])
        norm, a, b = m.measure_full_dynamic(A, 0, 0, 40)
        print(f"q = {qi} (2pi/L): |A|gs>| = {norm:.6f}, {len(a)} Lanczos steps")
        runs.append((norm, a, b))

    omegas = np.linspace(0.0, 4.0, 200)
    S = plot_sqw([q / L for q in qs], runs, omegas, E0, out, eta=0.06)
    print(f"S(q,w) heatmap written to {out}; max = {S.max():.4f}")


if __name__ == "__main__":
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    out = sys.argv[2] if len(sys.argv) > 2 else "sqw_chain.png"
    main(L, out)
