"""One-off profiling script: where does a generalized_inverse iteration go?

Run on the real TPU; prints amortized per-component costs. Not part of the
package (repo-root scratch tool, like bench.py)."""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from dune_eigensolver_tpu.factorize import factorize_banded_device
from dune_eigensolver_tpu.factorize.banded import banded_solve
from dune_eigensolver_tpu.ops.ortho import (
    b_orthonormalize_blocked,
    dot_products_diagonal,
)
from dune_eigensolver_tpu.solvers import generalized_inverse
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.spmm import spmm


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timed(label, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms (first {first:.1f}s)", flush=True)
    return best


def main():
    N = 256
    A = problems.laplacian_neumann_2d(N, dtype=np.float32)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float32)
    Ash = A.with_shifted_diagonal(1e-3)
    n = A.shape[0]
    X = jnp.ones((n, 8), np.float32)
    K = 20

    # chained component costs (all inside one jit, one fetch)
    f_spmm = jax.jit(
        lambda a, x: lax.fori_loop(0, K, lambda i, s: spmm(a, s) * 0.125, x)
    )
    t = timed("spmm x20 (per op)", f_spmm, Ash, X)
    print(f"  -> {t/K*1e3:.3f} ms/spmm", flush=True)

    f_dots = jax.jit(
        lambda a, x: lax.fori_loop(
            0, K, lambda i, s: s * (1 + dot_products_diagonal(s, spmm(a, s))[None, :] * 0), x
        )
    )
    t = timed("spmm+dots x20", f_dots, Ash, X)
    print(f"  -> {t/K*1e3:.3f} ms/iter", flush=True)

    f_ortho = jax.jit(
        lambda b, x: lax.fori_loop(
            0, K, lambda i, s: b_orthonormalize_blocked(lambda v: spmm(b, v), s)[0], x
        )
    )
    t = timed("b_ortho x20", f_ortho, B, X)
    print(f"  -> {t/K*1e3:.3f} ms/ortho", flush=True)

    for C in (256, 512):
        F = factorize_banded_device(Ash, C=C)
        f_solve = jax.jit(
            lambda Fa, x: lax.fori_loop(
                0, K, lambda i, s: banded_solve(Fa, s) * 0.1, x
            )
        )
        t = timed(f"banded_solve C={C} x20", f_solve, F, X)
        print(f"  -> {t/K*1e3:.3f} ms/solve", flush=True)

    # whole-solver per-iteration cost via differencing
    def run(iters):
        res = generalized_inverse(
            A, B, nev=8, tol=1e9, maxiter=iters + 5, min_iter=iters - 1, shift=1e-3
        )
        return int(res.iterations)

    for it in (2, 12):
        t0 = time.perf_counter()
        k = run(it)
        print(f"solver iters={k}: first {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        k = run(it)
        print(f"solver iters={k}: steady {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
