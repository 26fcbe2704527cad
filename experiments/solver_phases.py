"""TPU experiment: decompose generalized_inverse time-to-solution into
device factorization setup vs iteration loop, and compare against LOBPCG.

    python experiments_solver_phases.py [N]

One TPU process at a time.
"""

import sys
import time

import numpy as np
import jax

from dune_eigensolver_tpu.factorize.banded import (
    banded_inverse_factory,
    factorize_banded_device,
)
from dune_eigensolver_tpu.solvers import generalized_inverse, lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems


def fetch_sync(x):
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])  # fetch ONE scalar, not the array


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = np.float32
    A = problems.laplacian_neumann_2d(N, dtype=dtype)
    B = problems.laplacian_b_2d(N, 3, dtype=dtype)
    shift = 1e-3
    A_sh = A.axpy(shift, B)

    # --- phase 1: device factorization alone (second call = steady state) ---
    F = factorize_banded_device(A_sh)
    fetch_sync(F.fwd.dinv)
    t0 = time.perf_counter()
    F = factorize_banded_device(A_sh)
    fetch_sync(F.fwd.dinv)
    t_fact = time.perf_counter() - t0
    print(f"factorize_banded_device: {t_fact*1e3:.0f} ms  (C={F.stats[1]} nb={F.stats[2]})", flush=True)

    # --- phase 2: full solve with a prebuilt inverse (loop only) ---
    inv = banded_inverse_factory(A_sh)

    def run_gi():
        return generalized_inverse(
            A, B, nev=8, tol=2e-3, maxiter=200, shift=shift,
            inverse=lambda _ash: inv,
        )

    res = run_gi()
    fetch_sync(res.eigenvalues)
    t0 = time.perf_counter()
    res = run_gi()
    fetch_sync(res.eigenvalues)
    t_loop = time.perf_counter() - t0
    print(
        f"generalized_inverse loop-only: {t_loop*1e3:.0f} ms "
        f"({int(res.iterations)} iters => {t_loop/max(int(res.iterations),1)*1e3:.1f} ms/iter)",
        flush=True,
    )

    # --- phase 3: end-to-end (factorization + loop), steady state ---
    def run_full():
        return generalized_inverse(A, B, nev=8, tol=2e-3, maxiter=200, shift=shift)

    res = run_full()
    fetch_sync(res.eigenvalues)
    t0 = time.perf_counter()
    res = run_full()
    fetch_sync(res.eigenvalues)
    t_full = time.perf_counter() - t0
    print(f"generalized_inverse end-to-end: {t_full*1e3:.0f} ms", flush=True)

    # --- phase 4: LOBPCG with the same prebuilt inverse as preconditioner ---
    def run_lo():
        return lobpcg_generalized(
            A, B, nev=8, tol=2e-3, maxiter=200, shift=shift,
            precond=lambda _ash: inv,
        )

    res = run_lo()
    fetch_sync(res.eigenvalues)
    t0 = time.perf_counter()
    res = run_lo()
    fetch_sync(res.eigenvalues)
    t_lo = time.perf_counter() - t0
    print(
        f"lobpcg loop-only: {t_lo*1e3:.0f} ms ({int(res.iterations)} iters)  "
        f"evals[:3]={np.asarray(res.eigenvalues)[:3]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
