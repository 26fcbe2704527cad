"""TPU experiment: smallest-20 eigenpairs of the 3D 7-point Laplacian at
>= 10M dof on ONE chip (the BASELINE.md north-star problem, single-chip
slice), via LOBPCG with a loose-CG preconditioner — no factorization.

    python experiments/eigen3d_10m.py [N] [nev] [precond] [ortho_iters]

N=216 -> n = 10,077,696 dof. precond: "cgK" (Jacobi-CG, K iterations),
"cgKb" (same, bf16-streamed), or "chebD[,COND]" (degree-D Chebyshev on
[lmax/COND, lmax]); default cg25. NOTE: the fastest recipe has moved on —
geometric-multigrid V(1,1) bf16 + ortho_block=24 + b_identity, 2.98 s
(BASELINE.md); sweep it with experiments/ns_sweep.py ("mg1,1b:24:1:24").
This script remains the Krylov-preconditioner protocol.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize import (
    cg_inverse_factory,
    chebyshev_inverse_factory,
)
from dune_eigensolver_tpu.oracle.analytic import eigenvalues_laplace_dirichlet_3d
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    nev = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spec = sys.argv[3] if len(sys.argv) > 3 else "cg25"
    dtype = np.float32

    t0 = time.perf_counter()
    A = problems.laplacian_dirichlet_3d(N, dtype=dtype)
    n = A.shape[0]
    B = DIAMatrix(
        data=jnp.ones((1, n), dtype), offsets=(0,), shape=A.shape
    )  # identity mass: standard problem
    _ = np.asarray(jnp.ravel(A.data)[0])
    t_build = time.perf_counter() - t0
    print(f"build+upload: n={n:,} in {t_build:.1f}s", flush=True)

    if spec.isdigit():  # legacy positional form: bare iteration count = cgK
        prec = cg_inverse_factory(rtol=1e-2, maxiter=int(spec))
    elif spec.startswith("chebcg"):
        from dune_eigensolver_tpu.factorize import cheb_cg_inverse_factory

        parts = spec[6:].split(",")
        deg = int(parts[0]) if parts[0] else 7
        cond = float(parts[1]) if len(parts) > 1 else 30.0
        prec = cheb_cg_inverse_factory(degree=deg, cond_target=cond, rtol=1e-2, maxiter=25)
    elif spec.startswith("cheb"):
        parts = spec[4:].split(",")
        deg = int(parts[0]) if parts[0] else 16
        cond = float(parts[1]) if len(parts) > 1 else 30.0
        prec = chebyshev_inverse_factory(degree=deg, cond_target=cond)
    elif spec.startswith("cg"):
        rest = spec[2:]
        dt = None
        if rest.endswith("b"):  # "cg40b" = bf16-streamed inner CG
            import jax.numpy as jnp

            dt, rest = jnp.bfloat16, rest[:-1]
        prec = cg_inverse_factory(rtol=1e-2, maxiter=int(rest or 25), dtype=dt)
    else:
        raise ValueError(f"unrecognized preconditioner spec {spec!r}")
    oi = int(sys.argv[4]) if len(sys.argv) > 4 else 2  # ortho_iterations
    print(f"precond: {spec} ortho_iterations={oi}", flush=True)
    # fastest measured recipe (BASELINE.md): N=216 nev=24, spec=cg40b, oi=1
    run = lambda: lobpcg_generalized(
        A, B, nev=nev, tol=2e-3, maxiter=300, shift=0.0, precond=prec,
        min_iter=3, ortho_iterations=oi,
    )
    t0 = time.perf_counter()
    res = run()
    ev = np.asarray(res.eigenvalues)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run()
    _ = np.asarray(res.eigenvalues)
    t_solve = time.perf_counter() - t0

    ana = eigenvalues_laplace_dirichlet_3d(N, count=nev)
    err = np.abs(ev[:nev] - ana).max()
    print(
        f"lobpcg 3D: n={n:,} nev={nev} iters={int(res.iterations)} "
        f"conv={bool(res.converged)} time={t_solve:.2f}s "
        f"(first incl compile {t_first:.1f}s)",
        flush=True,
    )
    print(f"max |ev - analytic| = {err:.3e}  (tol 2e-3)", flush=True)
    print(f"evals[:6]   = {ev[:6]}", flush=True)
    print(f"analytic[:6]= {ana[:6]}", flush=True)


if __name__ == "__main__":
    main()
