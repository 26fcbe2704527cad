"""Nested-iteration north star: seed the 10M-dof fine-grid LOBPCG with
prolonged coarse-grid eigenvectors (full-multigrid-style nested iteration).

The north-star recipe (bench.py) converges in ~12 fine-grid iterations from
a random start; every fine iteration costs ~0.25 s at n=10.1M. The smallest
eigenvectors of the 3D Dirichlet Laplacian are smooth, so the same solve on
the half-resolution grid (N=108, n=1.26M — 8x cheaper per iteration)
produces a start block that linear interpolation (the MG prolongation,
factorize/multigrid.py::_prolong) carries to the fine grid with O(h^2)
accuracy. LOBPCG then only needs the few iterations that correct the
interpolation error instead of building the subspace from noise.

    python experiments/ns_nested.py [N] [variants...]

Variants: base | nest2:MIN_ITER[,coarse_tol] | nest3:MIN_ITER
Default: base nest2:1 nest2:2 nest3:1  (interleaved A/B rows, same chip
phase; the shared chip's throughput drifts, so only same-run rows compare).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize import mg_inverse_factory
from dune_eigensolver_tpu.factorize.multigrid import _prolong
from dune_eigensolver_tpu.oracle.analytic import eigenvalues_laplace_dirichlet_3d
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix

NEV, NGUARD = 20, 24
DTYPE = np.float32


def ident_b(n):
    return DIAMatrix(data=jnp.ones((1, n), DTYPE), offsets=(0,), shape=(n, n))


def make_prolong(Nc, Nf):
    """(nc, m) coarse eigenvector block -> (nf, m) fine start block."""

    @jax.jit
    def prolong(Yc):
        C = Yc.T.reshape(NGUARD, Nc, Nc, Nc)
        F = _prolong(C, (Nf, Nf, Nf))
        return F.reshape(NGUARD, Nf * Nf * Nf).T

    return prolong


def solve(A, B, prec, q0=None, min_iter=3, tol=2e-3):
    return lobpcg_generalized(
        A, B, nev=NGUARD, tol=tol, maxiter=300, shift=0.0, precond=prec,
        min_iter=min_iter, ortho_iterations=1, ortho_block=24,
        b_identity=True, q0=q0,
    )


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    variants = sys.argv[2:] or ["base", "nest2:1", "nest2:2", "nest3:1"]

    t0 = time.perf_counter()
    A = problems.laplacian_dirichlet_3d(N, dtype=DTYPE)
    n = A.shape[0]
    B = ident_b(n)
    _ = np.asarray(jnp.ravel(A.data)[0])
    print(f"build: n={n:,} in {time.perf_counter() - t0:.1f}s", flush=True)
    ana = eigenvalues_laplace_dirichlet_3d(N, count=NEV)
    prec = mg_inverse_factory(nu1=1, nu2=1, dtype=jnp.bfloat16)

    grids = {}  # Nc -> (A, B)
    prolongs = {}  # (Nc, Nf) -> jitted prolong (memoized: one trace each)

    def grid(Nc):
        if Nc not in grids:
            Ac = problems.laplacian_dirichlet_3d(Nc, dtype=DTYPE)
            grids[Nc] = (Ac, ident_b(Ac.shape[0]))
        return grids[Nc]

    def prolong(Nc, Nf):
        if (Nc, Nf) not in prolongs:
            prolongs[(Nc, Nf)] = make_prolong(Nc, Nf)
        return prolongs[(Nc, Nf)]

    def pipeline(levels, min_iter, coarse_tol):
        """levels: ascending grid sizes ending at N. Returns (res, per-level
        iteration counts); every solver/prolong call is a cached jit after
        the warmup pass."""
        q0 = None
        iters = []
        for i, Nl in enumerate(levels):
            Al, Bl = (A, B) if Nl == N else grid(Nl)
            last = Nl == N
            res = solve(
                Al, Bl, prec, q0=q0,
                min_iter=min_iter if (last and q0 is not None) else 3,
                tol=2e-3 if last else coarse_tol,
            )
            iters.append(int(res.iterations))
            if not last:
                q0 = prolong(Nl, levels[i + 1])(res.eigenvectors)
        return res, iters

    for var in variants:
        if var == "base":
            levels, min_iter, ctol = [N], 3, 2e-3
        else:
            kind, _, rest = var.partition(":")
            parts = rest.split(",") if rest else ["1"]
            min_iter = int(parts[0])
            ctol = float(parts[1]) if len(parts) > 1 else 2e-3
            levels = [N // 4, N // 2, N] if kind == "nest3" else [N // 2, N]
        res, iters = pipeline(levels, min_iter, ctol)  # warmup/compile
        ev = np.asarray(res.eigenvalues)
        t0 = time.perf_counter()
        res, iters = pipeline(levels, min_iter, ctol)
        _ = np.asarray(res.eigenvalues)
        t = time.perf_counter() - t0
        err = np.abs(np.sort(ev)[:NEV] - ana).max()
        print(
            f"NS_NESTED: var={var} levels={levels} iters={iters} "
            f"steady={t:.2f}s err20={err:.3e} conv={bool(res.converged)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
