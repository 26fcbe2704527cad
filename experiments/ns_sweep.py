"""North-star recipe sweep: build the 10M-dof 3D operator ONCE, then time
LOBPCG under several preconditioner/guard-block configs back to back.

    python experiments/ns_sweep.py [N] [spec:nev ...]

Each spec is the eigen3d_10m.py preconditioner grammar plus ":nev".
Reports steady-state (2nd-run) time and top-20 error vs the analytic
3D Dirichlet spectrum.
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from dune_eigensolver_tpu.factorize import (
    cg_inverse_factory,
    cheb_cg_inverse_factory,
    chebyshev_inverse_factory,
)
from dune_eigensolver_tpu.oracle.analytic import eigenvalues_laplace_dirichlet_3d
from dune_eigensolver_tpu.solvers import lobpcg_generalized
from dune_eigensolver_tpu.sparse import problems
from dune_eigensolver_tpu.sparse.formats import DIAMatrix


def make_prec(spec):
    if spec.startswith("mg"):
        # "mg" | "mg2" (2 cycles) | "mg1,1" (nu1,nu2) | suffix "b" = bf16
        # fine smoothing, e.g. "mg2,2b"
        from dune_eigensolver_tpu.factorize import mg_inverse_factory

        rest = spec[2:]
        dtype = None
        if rest.endswith("b"):
            dtype, rest = jnp.bfloat16, rest[:-1]
        cycles, nu = 1, (2, 2)
        if "," in rest:
            a, b = rest.split(",")
            nu = (int(a), int(b))
        elif rest:
            cycles = int(rest)
        return mg_inverse_factory(cycles=cycles, nu1=nu[0], nu2=nu[1], dtype=dtype)
    if spec.startswith("chebcg"):
        parts = spec[6:].split(",")
        deg = int(parts[0]) if parts[0] else 7
        cond = float(parts[1]) if len(parts) > 1 else 30.0
        return cheb_cg_inverse_factory(degree=deg, cond_target=cond, rtol=1e-2, maxiter=25)
    if spec.startswith("cheb"):
        parts = spec[4:].split(",")
        deg = int(parts[0]) if parts[0] else 16
        cond = float(parts[1]) if len(parts) > 1 else 30.0
        return chebyshev_inverse_factory(degree=deg, cond_target=cond)
    if spec.startswith("cg"):
        rest = spec[2:]
        dtype = None
        if rest.endswith("b"):  # "cg25b" = bf16 inner CG
            dtype, rest = jnp.bfloat16, rest[:-1]
        return cg_inverse_factory(rtol=1e-2, maxiter=int(rest or 25), dtype=dtype)
    raise ValueError(spec)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    configs = sys.argv[2:] or ["cg25:24", "chebcg7:24", "cg15:24", "cg25:32"]
    dtype = np.float32

    t0 = time.perf_counter()
    A = problems.laplacian_dirichlet_3d(N, dtype=dtype)
    n = A.shape[0]
    B = DIAMatrix(data=jnp.ones((1, n), dtype), offsets=(0,), shape=A.shape)
    _ = np.asarray(jnp.ravel(A.data)[0])
    print(f"build+upload: n={n:,} in {time.perf_counter() - t0:.1f}s", flush=True)
    ana20 = eigenvalues_laplace_dirichlet_3d(N, count=20)

    for cfg in configs:
        parts = cfg.split(":")  # spec[:nev[:ortho_iters[:ortho_block]]]
        spec = parts[0]
        nev = int(parts[1]) if len(parts) > 1 and parts[1] else 24
        oi = int(parts[2]) if len(parts) > 2 else 2
        ob = None
        if len(parts) > 3 and parts[3]:
            ob = "full" if parts[3] == "full" else int(parts[3])
        prec = make_prec(spec)
        run = lambda: lobpcg_generalized(  # noqa: E731
            A, B, nev=nev, tol=2e-3, maxiter=300, shift=0.0, precond=prec,
            min_iter=3, ortho_iterations=oi, ortho_block=ob, b_identity=True,
        )
        t0 = time.perf_counter()
        res = run()
        ev = np.asarray(res.eigenvalues)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run()
        _ = np.asarray(res.eigenvalues)
        t_solve = time.perf_counter() - t0
        err = np.abs(np.sort(ev)[:20] - ana20).max()
        print(
            f"NS_SWEEP: spec={spec} nev={nev} iters={int(res.iterations)} "
            f"conv={bool(res.converged)} steady={t_solve:.2f}s "
            f"first={t_first:.1f}s err20={err:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
