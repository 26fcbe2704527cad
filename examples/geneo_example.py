"""GenEO coarse-space setup example: smallest generalized eigenpairs with
adaptive selection, matching the reference driver's flagship use case
(eigenvalues_test method 'raes', src/dune-eigensolver.cc:475-500).

Run: python examples/geneo_example.py [N] [threshold]
"""

import sys
import time

import numpy as np

from dune_eigensolver_tpu.solvers import generalized_inverse_adaptive
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.utils.printers import show_spectrum


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, overlap=3, dtype=np.float32)
    print(f"GenEO pair: n={A.shape[0]}, threshold={threshold}")

    t0 = time.perf_counter()
    res, n_below = generalized_inverse_adaptive(
        A,
        B,
        threshold=threshold,
        nev=8,
        tol=2e-3,
        maxiter=400,
        shift=1e-3,
        rayleigh_ritz=True,
        verbose=1,
    )
    ev = np.asarray(res.eigenvalues)
    print(f"solved in {time.perf_counter() - t0:.2f}s, "
          f"{int(res.iterations)} iterations (last round)")
    show_spectrum(ev[: min(12, len(ev))])
    print(f"coarse space size (eigenvalues < {threshold}): {n_below}")


if __name__ == "__main__":
    main()
